package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness (not a spec): the nprobe sweep on a CLUSTERED
  * integer geometry where ROUTING loss is nonzero — the discriminating
  * fixture the round-14 sweep lacked (near-random embeddings put all
  * loss in PQ coding, so recall was identical from 1 probe to
  * exhaustive and the knob was invisible to p69's machinery).
  *
  * Geometry (deterministic, integer, EmbDim = 64): 8 seed PAIRS, one per
  * 8-dim block. Each pair's two seeds (ids 2p, 2p+1 — the 16 lowest ids,
  * which [[PipelineOps.deriveAnnQuantizer]] freezes as the IVF cells) sit
  * at 30·1 on opposite halves of the block, so each "cluster" is split
  * across exactly two cells. Every seed gets five planted true neighbors
  * straddling the midpoint: two biased toward the seed's own cell
  * (16/14), three toward the sibling cell (14/16) — the exact top-5 by
  * quantized L2, verified against fillers parked at 5·1 (strictly
  * farther). A 1-probe query therefore finds only the own-side dups;
  * the sibling cell holds the rest — recall RISES in the knob, which is
  * the property the round-14 fixture could not produce. Planted dups take
  * the lowest non-seed ids so ADC ties (PQ codes collapse within a cell)
  * resolve toward true neighbors, keeping the measurement about routing.
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
    var fillId = 16L + 16 * 5 // dups take the lowest non-seed ids
    for (p <- 0 until pairs) {
      val b = p * 8
      def inBlock(d: Int) = d >= b && d < b + 8
      def s1Half(d: Int) = d >= b && d < b + 4
      // the two cell seeds of this block
      rows += ((2L * p, vec(d => if (s1Half(d)) 30 else 0)))
      rows += ((2L * p + 1, vec(d => if (inBlock(d) && !s1Half(d)) 30 else 0)))
      // five planted true neighbors per seed, straddling the midpoint
      for (s <- 0 to 1) {
        val (own, oth) = if (s == 0) (s1Half _, (d: Int) => inBlock(d) && !s1Half(d))
                         else ((d: Int) => inBlock(d) && !s1Half(d), s1Half _)
        for (j <- 0 until 5) {
          val bump = b + (j + 2 * s) % 8 // unique position per dup
          val (vOwn, vOth) = if (j < 2) (16, 14) else (14, 16)
          rows += ((dupId, vec(d =>
            (if (own(d)) vOwn else if (oth(d)) vOth else 0) +
              (if (d == bump) 1 else 0))))
          dupId += 1
        }
      }
      // background fillers: strictly farther than every planted dup
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

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def minOf2(f: => Unit): Double = { val a = time(f); math.min(a, time(f)) }
    for (p <- Seq(1, 2, 4, 8, 16)) {
      def query() = PipelineOps.queryAnnIndex(spark, dir, idx, probes = p)
      def force(): Unit = query().write.format("noop").mode("overwrite").save()
      force() // warm
      val t = minOf2(force())
      val recall = PipelineOps.recallReportOf(spark, dir, query())
        .select(col("corpus_recall_ppm")).head().getLong(0)
      println(f"NPROBE-CLUSTERED probes=$p recall_ppm=$recall tQuery=$t%.3f")
    }
    spark.stop()
  }
}
