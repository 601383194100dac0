package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.streaming.{DedupStream, IngestBump, StateStore}

/** One-off decomposition of the CDC text marginal (round 13): replicates
  * bumpTextCdc's phases with a timer around each, over a pre-bumped base
  * root, to locate the O(state)/O(corpus) residuals the headline
  * CdcMarginalProbe number hides. */
object TextMarginalDecomp {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/ramp/sfB")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f; println(f"PHASE $tag ${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    val d0 = spark.read.parquet(s"$dir/documents.parquet")
    val maxId = d0.agg(max("doc_id")).collect()(0).getLong(0)
    val REM = 200L; val CHG = 200L; val ADD = 200L
    val remLo = maxId - REM - CHG + 1; val chgLo = maxId - CHG + 1
    val newDocs = d0.where(col("doc_id") < remLo)
      .unionByName(d0.where(col("doc_id") >= chgLo)
        .withColumn("text", concat(col("text"), lit(" changed"))))
      .unionByName(d0.where(col("doc_id") < ADD)
        .withColumn("doc_id", col("doc_id") + maxId + 1))
      .withColumn("n_chars", length(col("text")).cast("long")).localCheckpoint(false)
    val cdc = IngestBump.CorpusDelta(
      removedIds = d0.where(col("doc_id") >= remLo && col("doc_id") < chgLo)
        .select("doc_id"),
      changed = d0.where(col("doc_id") >= chgLo)
        .withColumn("text", concat(col("text"), lit(" changed")))
        .withColumn("n_chars", length(col("text")).cast("long")),
      added = d0.where(col("doc_id") < ADD)
        .withColumn("doc_id", col("doc_id") + maxId + 1)
        .withColumn("n_chars", length(col("text")).cast("long")))

    for (round <- Seq("warm", "measured")) {
      val tmp = java.nio.file.Files.createTempDirectory("textmarg").toString
      val root = s"$tmp/bump"
      IngestBump.bump(spark, root, d0)
      val stDir = s"$root/text"
      def p(tag: String)(f: => Unit): Unit =
        if (round == "measured") time(tag)(f) else f

      val m = IngestBump.textState(spark, root).get
      val docCols = Seq("doc_id", "text", "lang", "source", "n_chars").map(col)
      var deltaDocs: DataFrame = null; var deltaLog: DataFrame = null
      var departed: DataFrame = null; var newSurvIds: DataFrame = null
      var retired: DataFrame = null; var batchSurvhash: DataFrame = null
      var batchDocs: DataFrame = null
      p("delta-prep") {
        deltaDocs = cdc.changed.select(docCols: _*)
          .unionByName(cdc.added.select(docCols: _*)).localCheckpoint(false)
        deltaLog = DedupStream.arrivalLog(deltaDocs).localCheckpoint(false)
        departed = cdc.removedIds.select("doc_id")
          .unionByName(cdc.changed.select("doc_id")).localCheckpoint(false)
        deltaLog.count(); departed.count()
      }
      val livelog = m("livelog").join(departed, Seq("doc_id"), "left_anti")
        .unionByName(deltaLog)
      p("surv-select") {
        val sw = Window.partitionBy(col("content_hash"))
        newSurvIds = livelog
          .withColumn("__min", min(col("doc_id")).over(sw))
          .where(col("doc_id") === col("__min")).drop("__min")
          .localCheckpoint(false)
        newSurvIds.count()
      }
      p("valid-retire") {
        val validIds = m("survhash")
          .join(newSurvIds.select(col("doc_id"), col("content_hash").as("h2")), "doc_id")
          .where(col("content_hash") === col("h2")).select("doc_id")
        retired = m("survhash").select("doc_id")
          .join(validIds, Seq("doc_id"), "left_anti").localCheckpoint(false)
        batchSurvhash = newSurvIds.join(validIds, Seq("doc_id"), "left_anti")
          .localCheckpoint(false)
        retired.count(); batchSurvhash.count()
      }
      p("batch-bodies") {
        val promoted = batchSurvhash.select("doc_id")
          .join(deltaDocs.select("doc_id"), Seq("doc_id"), "left_anti")
        batchDocs = deltaDocs
          .join(batchSurvhash.select("doc_id"), Seq("doc_id"), "left_semi")
          .unionByName(newDocs.select(docCols: _*)
            .join(promoted, Seq("doc_id"), "left_semi"))
          .localCheckpoint(false)
        batchDocs.count()
      }
      var st: DedupStream.PairState = null
      var pd: DedupStream.PairDelta = null
      var verdict: DataFrame = null
      p("cc-only") {
        PipelineOps.connectedComponents(
          m("pairs").select(col("doc_a"), col("doc_b"))).count()
      }
      p("refresh-plan") {
        val r = DedupStream.refreshVerdictDelta(
          newSurvIds, batchDocs, livelog,
          Some(DedupStream.retire(DedupStream.PairState(m("grams"), m("pairs")), retired)))
        verdict = r._1; st = r._2; pd = r._3
      }
      p("gram-batch") { pd.newGrams.count() }
      p("new-pairs") { pd.newPairs.count() }
      p("saveDelta") {
        StateStore.saveDelta(stDir, Map(
          "retired" -> retired, "departed" -> departed,
          "grams" -> pd.newGrams, "pairs" -> pd.newPairs,
          "survhash" -> batchSurvhash.select("doc_id", "content_hash"),
          "livelog" -> deltaLog))
      }
      p("verdict") { verdict.count() }
    }
    spark.stop()
  }
}
