package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement harness (not a spec): the LSM READ-side fold cost across
  * chain depth — what justifies [[IngestBump.SnapshotEvery]]. Each delta
  * bump stacks one more layer of broadcast anti-joins + parquet scans
  * under every consumer of the folded state; the write side is O(delta)
  * regardless. This probe drives a CDC bump chain to depth 7 (one short
  * of the snapshot cadence) on each decade fixture and times, at every
  * depth:
  *
  *   - maint: the bump itself (retire + delta batch + delta write);
  *   - verdict: assembling the p36 verdict off the folded labels/livelog
  *     chain (forced by count — the per-bump publish cost);
  *   - gramScan: one consuming query over the folded gram state
  *     (sum of gram-array sizes — an array-touching full fold read).
  *
  * The 8th bump crosses the cadence and pays the snapshot rewrite —
  * timed too, as the amortized write-amplification row.
  *
  *   sbt "Test/runMain graft.streaming.FoldDepthProbe /tmp/ramp"
  * (fixtures from tools/gen_ramp_fixture.py; single-shot timing — bumps
  * advance state; one JVM, local[32] — the SCALING.md methodology). */
object FoldDepthProbe {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/tmp/ramp")
    val spark = SparkSession.builder()
      .master("local[32]").appName("fold-depth-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_folddepth").toString

    for (tag <- Seq("A", "B")) {
      val dir = s"$root/sf$tag"
      val broot = s"$tmp/fold_$tag"
      val d0 = spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text", "lang", "source", "n_chars")
      def snap(i: Int): DataFrame = d0
        .withColumn("text",
          when(col("doc_id") % 97 === i % 97, concat(col("text"), lit(s" r$i")))
            .otherwise(col("text")))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .localCheckpoint(false)

      IngestBump.bump(spark, broot, snap(0)) // depth 0: the founding snapshot
      var prev = snap(0)
      for (i <- 1 to IngestBump.SnapshotEvery) {
        val next = snap(i)
        val pk = prev.select(col("doc_id"), md5(col("text")).as("h0"))
        val nk = next.select(col("doc_id"), md5(col("text")).as("h1"))
        val delta = IngestBump.CorpusDelta(
          removedIds = pk.join(nk, Seq("doc_id"), "left_anti").select("doc_id"),
          changed = next.join(
            pk.join(nk, "doc_id").where(col("h0") =!= col("h1")).select("doc_id"),
            Seq("doc_id"), "left_semi"),
          added = next.join(pk, Seq("doc_id"), "left_anti"))
        var v: DataFrame = null
        val tMaint = time { v = IngestBump.bumpTextCdc(spark, broot, delta, next) }
        val tVerdict = time(v.count())
        val st = IngestBump.textState(spark, broot).get
        val tGram = time(
          st("grams").agg(sum(size(col("grams")))).collect())
        val depth = StateStore.chainLength(spark, s"$broot/text")
        println(f"FOLDDEPTH sf$tag bump=$i depth=$depth maint=$tMaint%.3f " +
          f"verdict=$tVerdict%.3f gramScan=$tGram%.3f")
        prev = next
      }
    }
    spark.stop()
  }
}
