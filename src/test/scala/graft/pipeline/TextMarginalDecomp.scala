package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.streaming.{DedupStream, IncrementalCc, IngestBump, StateStore}

/** One-off decomposition of the CDC text marginal: replicates the CURRENT
  * [[IngestBump.bumpTextCdc]] body phase-by-phase with a timer around each
  * (same derivations, forced in bump order), over a pre-bumped base root,
  * to locate the O(state)/O(corpus) residuals the headline
  * CdcMarginalProbe number hides. Kept in lock-step with the production
  * body — round 15 rewrote it for the touched-hash reselection, the
  * spanning-forest refresh, the stratified audit, and the LSM delta
  * write set.
  *
  *   sbt "Test/runMain graft.pipeline.TextMarginalDecomp /tmp/ramp/sfB"
  */
object TextMarginalDecomp {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/ramp/sfB")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      // bound driver-metadata growth by wall-clock, not heap pressure
      // (SCALING.md ops note): long single-JVM runs otherwise accumulate
      // weak-ref-cleanable RDD/shuffle state between rare full GCs
      .config("spark.cleaner.periodicGC.interval", "5min").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f; println(f"PHASE $tag ${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    val d0 = spark.read.parquet(s"$dir/documents.parquet")
    val maxId = d0.agg(max("doc_id")).collect()(0).getLong(0)
    val REM = 200L; val CHG = 200L; val ADD = 200L
    val remLo = maxId - REM - CHG + 1; val chgLo = maxId - CHG + 1
    val corpus = d0.where(col("doc_id") < remLo)
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

    val docCols = Seq("doc_id", "text", "lang", "source", "n_chars").map(col)
    for (round <- Seq("warm", "measured")) {
      val tmp = java.nio.file.Files.createTempDirectory("textmarg").toString
      val root = s"$tmp/bump"
      IngestBump.bump(spark, root, d0)
      val stDir = s"$root/text"
      def p(tag: String)(f: => Unit): Unit =
        if (round == "measured") time(tag)(f) else f

      val m = IngestBump.textState(spark, root).get
      // ---- mirrors bumpTextCdc top-to-bottom ---------------------------
      var deltaDocs: DataFrame = null; var departed: DataFrame = null
      var deltaLog: DataFrame = null; var livelog: DataFrame = null
      p("delta-prep") {
        deltaDocs = cdc.changed.select(docCols: _*)
          .unionByName(cdc.added.select(docCols: _*)).localCheckpoint(false)
        departed = cdc.removedIds.select("doc_id")
          .unionByName(cdc.changed.select("doc_id")).localCheckpoint(false)
        val retainedLog = m("livelog").join(departed, Seq("doc_id"), "left_anti")
        deltaLog = DedupStream.arrivalLog(deltaDocs)
          .join(retainedLog.join(deltaDocs.select("doc_id"), Seq("doc_id"), "left_semi"),
            Seq("doc_id", "content_hash"), "left_anti")
          .localCheckpoint(false)
        livelog = retainedLog.unionByName(deltaLog)
        deltaLog.count(); departed.count()
      }
      p("audit-1in64") { // private auditFeed replicated verbatim (mod=64)
        val mod = 64L
        val corpusSide = corpus.where(
          pmod(hash(col("source"), col("doc_id"), lit(0x5EED)), lit(mod)) === 0)
        val corpusOnly = DedupStream.arrivalLog(corpusSide)
          .join(livelog, Seq("doc_id", "content_hash"), "left_anti")
          .select(col("doc_id"), lit(1L).as("s"))
        val logSide = livelog.where(pmod(hash(col("doc_id"), lit(0x5EED)), lit(mod)) === 0)
        val logOnly = logSide
          .join(DedupStream.arrivalLog(
              corpus.join(logSide.select("doc_id"), Seq("doc_id"), "left_semi")),
            Seq("doc_id", "content_hash"), "left_anti")
          .select(col("doc_id"), lit(2L).as("s"))
        require(corpusOnly.unionByName(logOnly).limit(5).collect().isEmpty)
      }
      var touched: DataFrame = null; var reselected: DataFrame = null
      p("surv-reselect") {
        touched = m("livelog").join(departed, Seq("doc_id"), "left_semi")
          .select("content_hash")
          .unionByName(deltaLog.select("content_hash"))
          .distinct().localCheckpoint(false)
        val sw = Window.partitionBy(col("content_hash"))
        reselected = livelog.join(touched, Seq("content_hash"), "left_semi")
          .withColumn("__min", min(col("doc_id")).over(sw))
          .where(col("doc_id") === col("__min")).drop("__min")
          .localCheckpoint(false)
        reselected.count()
      }
      var newSurvIds: DataFrame = null; var retired: DataFrame = null
      var batchSurvhash: DataFrame = null
      p("valid-retire") {
        val untouchedSurv = m("survhash").join(touched, Seq("content_hash"), "left_anti")
        val validReselected = m("survhash")
          .join(reselected, Seq("doc_id", "content_hash"), "left_semi")
          .localCheckpoint(false)
        newSurvIds = untouchedSurv
          .unionByName(reselected.select("doc_id", "content_hash"))
        retired = m("survhash").join(touched, Seq("content_hash"), "left_semi")
          .select("doc_id")
          .join(validReselected.select("doc_id"), Seq("doc_id"), "left_anti")
          .localCheckpoint(false)
        batchSurvhash = reselected.select("doc_id", "content_hash")
          .join(validReselected.select("doc_id"), Seq("doc_id"), "left_anti")
          .localCheckpoint(false)
        retired.count(); batchSurvhash.count()
      }
      var batchDocs: DataFrame = null
      p("batch-bodies") {
        val promoted = batchSurvhash.select("doc_id")
          .join(deltaDocs.select("doc_id"), Seq("doc_id"), "left_anti")
        batchDocs = deltaDocs
          .join(batchSurvhash.select("doc_id"), Seq("doc_id"), "left_semi")
          .unionByName(corpus.select(docCols: _*)
            .join(promoted, Seq("doc_id"), "left_semi"))
          .localCheckpoint(false)
        batchDocs.count()
      }
      var pd: DedupStream.PairDelta = null
      p("pair-discovery") {
        pd = DedupStream.discoverPairs(batchDocs,
          Some(m("grams").join(retired, Seq("doc_id"), "left_anti")))
        pd.newGrams.count(); pd.newPairs.count()
      }
      var ld: IncrementalCc.LabelDelta = null
      p("cc-refresh") {
        ld = IncrementalCc.refresh(m("labels"), m("pairs"), retired, pd.newPairs)
        ld.labelsOut.count(); ld.labelsIn.count(); ld.pairsIn.count(); ld.pairsOut.count()
      }
      p("saveDelta") { // same table set + gbucket layout as advanceText
        StateStore.saveDelta(stDir, Map(
          "retired" -> retired, "departed" -> departed,
          "labelsOut" -> ld.labelsOut, "pairsOut" -> ld.pairsOut,
          "labelsIn" -> ld.labelsIn,
          "grams" -> pd.newGrams, "pairs" -> ld.pairsIn,
          "survhash" -> batchSurvhash, "livelog" -> deltaLog),
          Map("grams" -> Seq("gbucket")))
      }
      p("verdict") {
        val labelsView = m("labels")
          .join(ld.labelsOut.select(col("node")), Seq("node"), "left_anti")
          .unionByName(ld.labelsIn)
        DedupStream.verdictFromLabels(newSurvIds, livelog, labelsView).count()
      }
      // the production call on its own fresh root, same JVM: the gap
      // between this and the phase sum above is what the replication
      // misses — when healthy they MATCH (the phases above ARE the bump)
      val root2 = s"$tmp/bump2"
      IngestBump.bump(spark, root2, d0)
      p("production-bumpTextCdc") {
        IngestBump.bumpTextCdc(spark, root2, cdc, corpus).count()
      }
    }
    spark.stop()
  }
}
