package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness (not a spec): the nprobe quality/latency sweep —
  * [[PipelineOps.queryAnnIndex]]'s probe knob scored by the p69 recall
  * machinery against exact quantized-L2 ground truth, versus query
  * latency, on the decade fixture's large half. Pins the knob's default
  * to the measured knee (SCALING.md's nprobe table).
  *
  *   sbt "Test/runMain graft.pipeline.NprobeProbe /tmp/ramp"
  * (fixtures from tools/gen_ramp_fixture.py; min-of-2 timing, one JVM,
  * local[32] — the SCALING.md methodology). */
object NprobeProbe {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/tmp/ramp")
    val spark = SparkSession.builder()
      .master("local[32]").appName("nprobe-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def minOf2(f: => Unit): Double = { val a = time(f); math.min(a, time(f)) }

    val dir = s"$root/sfB"
    val idx = java.nio.file.Files.createTempDirectory("graft_nprobe_idx").toString
    val q = PipelineOps.quantized(spark, dir)
      .select(col("vec_id"), col("q"), col("nrm")).localCheckpoint(false)
    PipelineOps.buildAnnIndexOf(q, idx)

    for (p <- Seq(1, 2, 4, 8, 16)) {
      def query() = PipelineOps.queryAnnIndex(spark, dir, idx, probes = p)
      def force(): Unit = query().write.format("noop").mode("overwrite").save()
      force() // warm
      val t = minOf2(force())
      val recall = PipelineOps.recallReportOf(spark, dir, query())
        .select(col("corpus_recall_ppm")).head().getLong(0)
      println(f"NPROBE probes=$p recall_ppm=$recall tQuery=$t%.3f")
    }
    spark.stop()
  }
}
