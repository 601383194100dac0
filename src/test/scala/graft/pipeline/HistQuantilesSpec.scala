package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.{spark, SfDir}

/** p43's two contracts: (1) the declared-domain counters are a MERGEABLE
  * summary — any carving of the corpus into batches, counted separately
  * and summed, yields the identical quantile table (the property that lets
  * a streaming sum maintain it); (2) every estimate sits within one bucket
  * width above the exact p42 value (upper-edge reporting: est ∈
  * [exact, exact + width)). */
class HistQuantilesSpec extends AnyFunSuite {

  private val width =
    (PipelineOps.HistHi - PipelineOps.HistLo + 1) / PipelineOps.HistNumBins

  test("estimates bound the exact deciles from above by one bucket width") {
    val est = PipelineOps.histQuantiles(spark, SfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    val exact = PipelineOps.quantiles(spark, SfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(est.keySet == exact.keySet && est.nonEmpty)
    est.foreach { case (k, e) =>
      assert(e > exact(k) - 1 && e <= exact(k) + width, s"$k est=$e exact=${exact(k)}")
    }
  }

  test("batch-carved counters merged by addition equal the one-shot table") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val vals = spark.read.parquet(s"$SfDir/documents.parquet")
      .select(col("source"), col("n_chars").as("v"))
    def img(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(t => (t._1, t._2)).toSeq
    val oneShot = img(PipelineOps.histQuantilesOf(vals))
    (1 to 3).foreach { trial =>
      // random doc carving into 3 "batches": union of the parts is the
      // whole, and histQuantilesOf's first shuffle sums counters across
      // them exactly like a maintained summary would
      val tagged = vals.withColumn("b", pmod(hash(col("v"), lit(trial * 31)), lit(3)))
      val parts = (0 to 2).map(i => tagged.where(col("b") === i).drop("b"))
      assert(parts.map(_.count()).sum == vals.count())
      val merged = img(PipelineOps.histQuantilesOf(parts.reduce(_ unionByName _)))
      assert(merged == oneShot, s"trial$trial")
    }
  }

  test("a SummaryRefresh-maintained counter store serves the batch deciles") {
    import java.nio.file.Files
    import graft.streaming.SummaryRefresh
    // the claim in p43's contract, end-to-end: fact files land one per
    // trigger, the stream derives the bin grain and folds counters into
    // the store, and quantiles served FROM THE STORE equal the batch pass
    val tmp = Files.createTempDirectory("graft_hist").toString
    val docs = spark.read.parquet(s"$SfDir/documents.parquet")
      .select(col("source"), col("n_chars").as("v"))
    docs.repartition(3).write.mode("overwrite").parquet(s"$tmp/fact")

    val q = SummaryRefresh.run(
      spark, s"$tmp/fact", docs.schema, s"$tmp/store", s"$tmp/ckpt",
      keys = Seq("source", "bin"),
      meas = Seq(SummaryRefresh.MeasureSpec("c", "1", "sum")),
      transform = _.withColumn("bin", expr(PipelineOps.histBinExpr("v"))))
    try q.processAllAvailable() finally q.stop()

    def img(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(t => (t._1, t._2)).toSeq
    val served = img(PipelineOps.histQuantilesFromCounts(
      spark.read.parquet(s"$tmp/store")))
    val batch = img(PipelineOps.histQuantilesOf(docs))
    assert(served.nonEmpty && served == batch)
  }

  test("clamped outliers land in the edge buckets, ranks unchanged") {
    import spark.implicits._
    val base = (1 to 100).map(i => ("s", i.toLong))
    val spiked = base ++ Seq(("s", -500L), ("s", 1L << 40)) // outside the domain
    val got = PipelineOps.histQuantilesOf(spiked.toDF("source", "v")).collect()
      .map(r => r.getLong(1) -> r.getLong(3)).toMap
    // 102 values: decile d targets rank ceil(d*102/10); the two clamped
    // rows occupy the extreme buckets, middle deciles stay in-domain
    assert(got(5L) <= PipelineOps.HistHi && got(5L) >= 1L)
    assert(got(9L) <= PipelineOps.HistHi + 1) // top decile may hit the clamp bucket edge
  }
}
