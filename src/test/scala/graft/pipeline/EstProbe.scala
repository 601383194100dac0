package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness (not a spec): times the candidate-strategy
  * estimate jobs on a ramp fixture — the SCALING.md "decision overhead"
  * rows. Run with:
  *   sbt "Test/runMain graft.pipeline.EstProbe /tmp/ramp/sfB"
  * (fixture from tools/gen_ramp_fixture.py). Reports the block-side
  * estimate, the exact prefix-side estimate, and the 1-in-64 key-space
  * sampled prefix estimate with their wall times. */
object EstProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/ramp/sfB")
    val spark = SparkSession.builder()
      .master("local[32]").appName("est-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text", "lang", "source", "n_chars")
    val grams = PipelineOps.ngramGrams(d).localCheckpoint(false)
    grams.count()
    val aK = grams.select(col("doc_id").as("doc_a"), col("lang"), col("source"), col("block"))
    val bK = grams.select(col("doc_id").as("doc_b"), col("lang"), col("source"), col("block"))
    val keys = Seq("lang", "source", "block")
    PipelineOps.estJoinRows(aK, bK, keys) // warm
    val (blockEst, tBlock) = t(PipelineOps.estJoinRows(aK, bK, keys))
    val pa = PipelineOps.prefixedView(grams, "doc_a", 3, 5)
    val pb = PipelineOps.prefixedView(grams, "doc_b", 3, 5)
    PipelineOps.estJoinRows(pa, pb, keys :+ "ph") // warm
    val (exactEst, tExact) = t(PipelineOps.estJoinRows(pa, pb, keys :+ "ph"))
    val (sampEst, tSamp) = t(PipelineOps.estJoinRows(pa, pb, keys :+ "ph", 64L))
    println(f"ESTPROBE dir=$dir blockEst=$blockEst tBlock=$tBlock%.3f " +
      f"exactEst=$exactEst tExact=$tExact%.3f sampEst=$sampEst tSamp=$tSamp%.3f " +
      f"ratio=${sampEst.toDouble / exactEst}%.3f")
    spark.stop()
  }
}
