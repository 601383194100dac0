package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.{DedupStream, IncrementalCc, IngestBump}

/** One-off decomposition of the text bump's label-maintenance phase under
  * the round-15 spanning-forest certificate: pre-builds the bump state on
  * a ramp fixture, derives the same fixed (200 rem / 200 chg / 200 add)
  * delta the CdcMarginalProbe uses, then times pair discovery and the
  * [[IncrementalCc.refresh]] outputs separately — the split that locates
  * how much of the marginal is the (now contraction-sized) label
  * maintenance vs the scan-shaped discovery terms.
  *
  *   sbt "Test/runMain graft.pipeline.CcRefreshDecomp /tmp/ramp/sfA"
  */
object CcRefreshDecomp {
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
      val t0 = System.nanoTime(); f
      println(f"CCPHASE $tag ${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    val d0 = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val maxId = d0.agg(max("doc_id")).collect()(0).getLong(0)
    val REM = 200L; val CHG = 200L; val ADD = 200L
    val remLo = maxId - REM - CHG + 1; val chgLo = maxId - CHG + 1
    val newDocs = d0.where(col("doc_id") < remLo)
      .unionByName(d0.where(col("doc_id") >= chgLo)
        .withColumn("text", concat(col("text"), lit(" changed"))))
      .unionByName(d0.where(col("doc_id") < ADD)
        .withColumn("doc_id", col("doc_id") + maxId + 1))
      .withColumn("n_chars", length(col("text")).cast("long")).localCheckpoint(false)

    for (round <- Seq("warm", "measured")) {
      val tmp = java.nio.file.Files.createTempDirectory("ccdecomp").toString
      val root = s"$tmp/bump"
      IngestBump.bump(spark, root, d0)
      val m = IngestBump.textState(spark, root).get
      def p(tag: String)(f: => Unit): Unit =
        if (round == "measured") time(tag)(f) else f

      val newSurv = PipelineOps.survivorsOf(newDocs).localCheckpoint(false)
      val validIds = m("survhash")
        .join(newSurv.select(col("doc_id"), col("content_hash").as("h2")), "doc_id")
        .where(col("content_hash") === col("h2")).select("doc_id")
      val retired = m("survhash").select("doc_id")
        .join(validIds, Seq("doc_id"), "left_anti").localCheckpoint(false)
      val batch = newSurv.join(validIds, Seq("doc_id"), "left_anti")
        .localCheckpoint(false)
      p("exact-stage") { retired.count(); batch.count() }

      var pd: DedupStream.PairDelta = null
      p("pair-discovery") {
        pd = DedupStream.discoverPairs(batch,
          Some(m("grams").join(retired, Seq("doc_id"), "left_anti")))
        pd.newPairs.count()
      }
      var ld: IncrementalCc.LabelDelta = null
      // round 16: split refresh's INTERNAL stages through the stagePin
      // seam — each pinned stage is forced (count) as refresh builds it,
      // so its cost lands on its own tag instead of wherever laziness
      // puts it; the seam wraps the production body, no replication
      val stageTimes = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Double, Int, Int)]
      val jobCount = new java.util.concurrent.atomic.AtomicInteger
      val jobSites = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val jobListener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobCount.incrementAndGet()
          jobSites.add(j.stageInfos.lastOption.map(_.name).getOrElse("?"))
          ()
        }
      }
      spark.sparkContext.addSparkListener(jobListener)
      var lastEnd = System.nanoTime()
      var lastJobs = jobCount.get()
      IncrementalCc.stagePin = (tag, df) => {
        val t0 = System.nanoTime()
        val gap = (t0 - lastEnd) / 1e9 // eager actions + plan building since the previous stage
        val gapJobs = jobCount.get() - lastJobs
        df.count()
        lastEnd = System.nanoTime()
        val forceJobs = jobCount.get() - lastJobs - gapJobs
        lastJobs = jobCount.get()
        val (g0, f0, gj, fj) = stageTimes.getOrElse(tag, (0.0, 0.0, 0, 0))
        stageTimes(tag) = (g0 + gap, f0 + (lastEnd - t0) / 1e9, gj + gapJobs, fj + forceJobs)
        df
      }
      lastEnd = System.nanoTime()
      lastJobs = jobCount.get()
      try p("cc-refresh") {
        ld = IncrementalCc.refresh(m("labels"), m("pairs"), retired, pd.newPairs)
        ld.labelsOut.count(); ld.labelsIn.count(); ld.pairsIn.count()
      } finally {
        IncrementalCc.stagePin = (_, df) => df
        // shared SparkContext: an orphaned listener would accumulate
        // across harness invocations and absorb unrelated jobs' counts
        spark.sparkContext.removeSparkListener(jobListener)
      }
      if (round == "measured") {
        stageTimes.foreach { case (tag, (gap, force, gj, fj)) =>
          println(f"CCSTAGE $tag gap=$gap%.2f ($gj jobs) force=$force%.2f ($fj jobs)")
        }
        val sites = jobSites.toArray(Array.empty[String])
          .groupBy(identity).map { case (s, xs) => s -> xs.length }.toSeq
          .sortBy(-_._2)
        sites.take(12).foreach { case (s, n) => println(s"CCJOBS $n x $s") }
      }
      if (round == "measured") {
        println(s"CCSIZE labelsOut=${ld.labelsOut.count()} labelsIn=${ld.labelsIn.count()} " +
          s"pairsIn=${ld.pairsIn.count()} edgeState=${m("pairs").count()} " +
          s"labels=${m("labels").count()}")
      }
    }
    spark.stop()
  }
}
