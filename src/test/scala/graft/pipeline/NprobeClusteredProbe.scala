package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness (not a spec): the nprobe sweep on a CLUSTERED
  * integer geometry where ROUTING loss is nonzero — the discriminating
  * fixture the round-14 sweep lacked (near-random embeddings put all
  * loss in PQ coding, so recall was identical from 1 probe to exhaustive
  * and the knob was invisible).
  *
  * Geometry (deterministic, integer, EmbDim = 64): 8 seed PAIRS, one per
  * 8-dim block. Each pair's two seeds (ids 2p, 2p+1 — the 16 lowest ids,
  * which [[PipelineOps.deriveAnnQuantizer]] freezes as the IVF cells) sit
  * at 30·1 on opposite halves of the block. Each EVEN seed gets five
  * planted true neighbors: two biased toward its own cell (16/14 on the
  * halves) and three toward the sibling cell (14/16) — by quantized L2
  * the exact top-5 of an even query, with fillers parked at 5·1 strictly
  * farther. The three sibling-biased neighbors cosine-route to the OTHER
  * cell, so a 1-probe query's candidate pool holds only 2 of its 5 true
  * neighbors and the pool completes at 2 probes: routing loss exists and
  * closes in the knob.
  *
  * Two recall figures per probe count:
  *   - candidate_ppm: exact top-5 ∩ the probed candidate POOL — the pure
  *     ROUTING metric the nprobe knob controls; rises 2/5 → 5/5 here.
  *   - endtoend_ppm: p69's corpus_recall_ppm after ADC ranking — BOUNDED
  *     by PQ coding at this codebook scale (8 entries per subspace), the
  *     same ceiling the round-14 sweep measured; reported for context.
  *
  *   sbt "Test/runMain graft.pipeline.NprobeClusteredProbe"
  * (min-of-2 timing, one JVM, local[32] — the SCALING.md methodology). */
object NprobeClusteredProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]").appName("nprobe-clustered-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dim = 64
    val pairs = 8 // one per 8-dim block; 2 seeds each = the 16 IVF cells
    def vec(f: Int => Int): Seq[Float] = (0 until dim).map(d => f(d).toFloat)

    val rows = Seq.newBuilder[(Long, Seq[Float])]
    var dupId = 16L
    var fillId = 16L + 8 * 5 // dups take the lowest non-seed ids
    for (p <- 0 until pairs) {
      val b = p * 8
      def inBlock(d: Int) = d >= b && d < b + 8
      def s1Half(d: Int) = d >= b && d < b + 4
      def s2Half(d: Int) = inBlock(d) && !s1Half(d)
      // 30 on the own half, 10 on the sibling half: the shared component
      // makes the SIBLING the genuine second-nearest cell by cosine (all
      // other pairs' cells are orthogonal), so the probe order closes the
      // routing loss at exactly 2 probes instead of scanning tied cells
      // in id order
      rows += ((2L * p, vec(d => if (s1Half(d)) 30 else if (s2Half(d)) 10 else 0)))
      rows += ((2L * p + 1, vec(d => if (s2Half(d)) 30 else if (s1Half(d)) 10 else 0)))
      // five planted true neighbors of the EVEN seed: j<2 route to its own
      // cell, j>=2 to the sibling's (the routing loss a 1-probe query pays)
      for (j <- 0 until 5) {
        val bump = b + (2 + j) % 8
        val (vOwn, vOth) = if (j < 2) (16, 14) else (14, 16)
        rows += ((dupId, vec(d =>
          (if (s1Half(d)) vOwn else if (s2Half(d)) vOth else 0) +
            (if (d == bump) 1 else 0))))
        dupId += 1
      }
      for (i <- 0 until 30) {
        val bump = b + i % 8
        rows += ((fillId, vec(d =>
          (if (inBlock(d)) 5 else 0) + (if (d == bump) 1 else 0))))
        fillId += 1
      }
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_nprobe_clustered").toString
    rows.result().toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val idx = java.nio.file.Files.createTempDirectory("graft_nprobe_cidx").toString
    val q = PipelineOps.quantized(spark, dir)
      .select(col("vec_id"), col("q"), col("nrm")).localCheckpoint(false)
    PipelineOps.buildAnnIndexOf(q, idx)

    // exact top-5 ground truth (quantized L2, the p69 contract) and the
    // cell assignment — both tiny here, collected once
    val corpus = q.select(col("vec_id").as("nbr_id"), col("q").as("qb"))
    val queries = q.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("q").as("qa"), col("nrm").as("nrm_a"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("l2").asc, col("nbr_id").asc)
    val exact = queries.crossJoin(corpus)
      .where(col("query_id") =!= col("nbr_id"))
      .withColumn("l2", graft.functions.QuantizedL2Sq(col("qa"), col("qb")))
      .withColumn("rn", row_number().over(w)).where(col("rn") <= PipelineOps.PqTopK)
      .select("query_id", "nbr_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val assign = spark.read.parquet(s"$idx/ivf_assign.parquet")
      .collect().map(r => r.getAs[Long]("nbr_id") -> r.getAs[Long]("ccid")).toMap
    val cents = spark.read.parquet(s"$idx/ivf_cents.parquet")
    val cellRank: Map[Long, Seq[Long]] = queries
      .crossJoin(cents)
      .withColumn("cdot", graft.functions.QuantizedDot(col("qa"), col("qb")))
      .withColumn("ccos", col("cdot").cast("double") /
        (sqrt(col("nrm_a").cast("double")) * sqrt(col("nrm_b").cast("double"))))
      .select("query_id", "ccid", "ccos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(t => (-t._3, t._2)).map(_._2).toSeq).toMap

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def minOf2(f: => Unit): Double = { val a = time(f); math.min(a, time(f)) }
    for (p <- Seq(1, 2, 4, 8, 16)) {
      // candidate (routing) recall: exact top-5 ∩ the probed pool
      val hits = exact.toSeq.map { case (qid, truth) =>
        val probed = cellRank(qid).take(p).toSet
        truth.count(n => probed.contains(assign(n)))
      }.sum
      val candPpm = hits * 1000000L / (exact.size * PipelineOps.PqTopK)
      def query() = PipelineOps.queryAnnIndex(spark, dir, idx, probes = p)
      def force(): Unit = query().write.format("noop").mode("overwrite").save()
      force() // warm
      val t = minOf2(force())
      val e2e = PipelineOps.recallReportOf(spark, dir, query())
        .select(col("corpus_recall_ppm")).head().getLong(0)
      println(f"NPROBE-CLUSTERED probes=$p candidate_ppm=$candPpm endtoend_ppm=$e2e tQuery=$t%.3f")
    }
    spark.stop()
  }
}
