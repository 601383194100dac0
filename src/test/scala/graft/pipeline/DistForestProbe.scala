package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness (not a spec): [[PipelineOps.ccWithForest]] ABOVE the
  * driver-tail bound — the regime the distributed Borůvka path exists for.
  * Synthesizes a dup-graph-shaped edge set several times the 2²⁰ bound
  * (clique-ish duplicate clusters + long chains + hub stars, the three
  * shapes the fuzz gates), entirely distributed (spark.range, no driver
  * materialization), then:
  *
  *   - times the DRIVER tail (bound forced above the edge count): collect +
  *     union-find + parallelize — the path's local-mode ceiling;
  *   - times the DISTRIBUTED Borůvka path (production default at this
  *     size): labels AND a full original-edge spanning forest;
  *   - checks the certificate arithmetic at scale: |forest| must equal
  *     |nodes| − |components| exactly (the per-component spanning-tree
  *     count, summed), and every forest row must be an input edge
  *     (anti-join count 0).
  *
  * The local wall-clock comparison is honest about what it is: at one
  * JVM the driver tail wins on fixed overheads (it exists because of
  * that), while the distributed path's value is that it RUNS at sizes
  * where collect() cannot — the probe pins its round count and
  * per-round shape so the 100 TB extrapolation is arithmetic, not hope.
  *
  *   sbt "Test/runMain graft.pipeline.DistForestProbe [nCliqueBlocks]"
  */
object DistForestProbe {
  def main(args: Array[String]): Unit = {
    val blocks = args.headOption.map(_.toInt).getOrElse(30000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      // bound driver-metadata growth by wall-clock, not heap pressure
      // (SCALING.md ops note): long single-JVM runs otherwise accumulate
      // weak-ref-cleanable RDD/shuffle state between rare full GCs
      .config("spark.cleaner.periodicGC.interval", "5min").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // clique blocks: 10 nodes each, all 45 intra-edges — the dup-cluster
    // shape. Node ids spaced so blocks never touch.
    val within = spark.range(0, 10).select(col("id").as("i"))
      .crossJoin(spark.range(0, 10).select(col("id").as("j")))
      .where(col("i") < col("j"))
    val cliques = spark.range(0, blocks).select(col("id").as("b"))
      .crossJoin(within)
      .select((col("b") * 100 + col("i")).as("doc_a"), (col("b") * 100 + col("j")).as("doc_b"))
    // chains: 200-node paths, one per 100 blocks
    val chainBase = blocks.toLong * 100
    val chains = spark.range(0, blocks / 100 * 199).select(
      expr("id div 199").as("c"), (col("id") % 199).as("i"))
      .select((lit(chainBase) + col("c") * 1000 + col("i")).as("doc_a"),
        (lit(chainBase) + col("c") * 1000 + col("i") + 1).as("doc_b"))
    // stars: 500-leaf hubs, one per 200 blocks
    val starBase = chainBase + blocks.toLong * 100
    val stars = spark.range(0, blocks / 200 * 500).select(
      expr("id div 500").as("s"), (col("id") % 500).as("i"))
      .select((lit(starBase) + col("s") * 1000).as("doc_a"),
        (lit(starBase) + col("s") * 1000 + col("i") + 1).as("doc_b"))
    // one DEEP chain: 50k nodes — negligible edge mass, but it alone
    // drives the Borůvka round count to ~log₂(50k) ≈ 16, which is what
    // separates the hybrid finish (2 rounds + driver residual) from the
    // pure path (every round a full scheduling barrier on a cluster)
    val deepBase = starBase + blocks.toLong * 100
    val deep = spark.range(0, 49999).select(
      (lit(deepBase) + col("id")).as("doc_a"),
      (lit(deepBase) + col("id") + 1).as("doc_b"))
    val edges = cliques.unionByName(chains).unionByName(stars).unionByName(deep)
      .localCheckpoint(true)
    val nEdges = edges.count()
    val nNodes = edges.select(col("doc_a").as("n")).union(edges.select(col("doc_b").as("n")))
      .distinct().count()
    val nComps = blocks + blocks / 100 + blocks / 200 + 1
    println(s"DFPROBE edges=$nEdges nodes=$nNodes comps=$nComps " +
      s"(driver bound=${1L << 20}; ${if (nEdges > (1L << 20)) "ABOVE" else "below"})")

    def run(tag: String, bound: Long): Unit = {
      val t0 = System.nanoTime()
      val (labels, forest) = PipelineOps.ccWithForest(edges, bound)
      val nLab = labels.count(); val nF = forest.count()
      val secs = (System.nanoTime() - t0) / 1e9
      val comps = labels.select("label").distinct().count()
      val notInput = forest.join(edges, Seq("doc_a", "doc_b"), "left_anti").count()
      val ok = nLab == nNodes && comps == nComps && nF == nNodes - comps && notInput == 0
      println(f"DFPROBE $tag%-12s $secs%8.2f s  labels=$nLab comps=$comps forest=$nF " +
        f"(want ${nNodes - comps}) nonInputForestRows=$notInput ${if (ok) "OK" else "INVARIANT-FAIL"}")
      require(ok, s"$tag invariants")
    }
    run("driver-tail", Long.MaxValue)
    run("distributed", 0L) // bound 0 → pure Borůvka, hybrid finish off
    run("dist-hybrid", 1L << 20) // production default: hybrid finish on
    spark.stop()
  }
}
