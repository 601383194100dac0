package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.{spark, SfDir}

class EventStreamSpec extends AnyFunSuite {

  test("file-stream windowed stats equal the batch computation over events.parquet") {
    val stream = EventStream.windowedStats(EventStream.readEvents(spark, SfDir))
    val q = stream.writeStream
      .format("memory").queryName("win_stats").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("win_stats")
        .select("day", "event_type", "n", "sum_value")
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1.getTime, t._2))
      val want = graft.sources.EventsSource.read(spark, SfDir)
        .withColumn("ts", timestamp_micros(col("ts")))
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
        .select(col("window.start"), col("event_type"), col("n"), col("sum_value"))
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1.getTime, t._2))
      assert(got.nonEmpty)
      assert(got.toSeq == want.toSeq)
    } finally q.stop()
  }

  test("streaming dedup drops replayed events within the watermark") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val df = input.toDF().toDF("event_id", "ts", "value")
    val q = EventStream.dedupEvents(df).writeStream
      .format("memory").queryName("dedup_events").outputMode("append").start()
    try {
      val t = new Timestamp(1700000000000L)
      input.addData((1L, t, 1.0), (2L, t, 2.0), (1L, t, 1.0))
      q.processAllAvailable()
      input.addData((2L, t, 2.0), (3L, t, 3.0)) // replay of 2 across batches
      q.processAllAvailable()
      val ids = spark.table("dedup_events").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("streaming dedup verdict equals the batch p36 on ordered replay") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    // corpus = sf0.001 documents + replayed copies of the first 20 texts
    // under new ids — the exact stage must drop every replay inline, and
    // the refreshed verdict must match the batch operator on the SAME
    // augmented corpus (covering all three reasons: exact, near, kept)
    val base = spark.read.parquet(s"$SfDir/documents.parquet")
      .select("doc_id", "text", "lang", "source", "n_chars")
    val replays = base.where(col("doc_id") < 20)
      .withColumn("doc_id", col("doc_id") + lit(100000L))
    val corpus = base.unionByName(replays)
    val rows = corpus.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4),
          new Timestamp(1700000000000L)))
      .sortBy(_._1)

    val input = MemoryStream[(Long, String, String, String, Long, Timestamp)]
    val df = input.toDF().toDF("doc_id", "text", "lang", "source", "n_chars", "ts")
    val q = DedupStream.exactStage(df).writeStream
      .format("memory").queryName("dedup_survivors").outputMode("append").start()
    try {
      // ordered replay across several micro-batches: originals land before
      // their replayed copies, so first-arrival == the batch min(doc_id)
      rows.grouped(200).foreach { chunk => input.addData(chunk.toSeq); q.processAllAvailable() }

      val survivors = spark.table("dedup_survivors")
      // inline stage dropped exactly the replays
      assert(survivors.count() == base.count())
      assert(survivors.where(col("doc_id") >= 100000L).count() == 0)

      val got = DedupStream
        .refreshVerdict(survivors, DedupStream.arrivalLog(corpus))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
      val want = graft.pipeline.PipelineOps.dedupVerdictOf(corpus)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
      assert(got.length == want.length && got.toSeq == want.toSeq)
      // the fixture + replays exercise every verdict class
      val reasons = got.map(_._2).toSet
      assert(reasons == Set("exact", "near", "kept"), reasons.toString)
    } finally q.stop()
  }

  test("incremental near-refresh over batches equals the full recompute and batch p36") {
    // same augmented corpus as the replay test; here the survivors arrive
    // in three batches and each refresh grams/pairs ONLY its batch,
    // merging edges into the carried state — the final verdict must be
    // row-identical to both the O(history) full recompute and batch p36.
    // Batches split so near-dup pairs STRADDLE refreshes (cross-batch
    // pairs only discoverable via the new-vs-history join).
    val base = spark.read.parquet(s"$SfDir/documents.parquet")
      .select("doc_id", "text", "lang", "source", "n_chars")
    val replays = base.where(col("doc_id") < 20)
      .withColumn("doc_id", col("doc_id") + lit(100000L))
    val corpus = base.unionByName(replays)
    // exact-stage survivors under ordered replay = min doc_id per hash
    val survivors = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(md5(col("text"))).orderBy(col("doc_id").asc)
      corpus.withColumn("rn", row_number().over(w)).where(col("rn") === 1).drop("rn")
        .withColumn("content_hash", md5(col("text")))
    }
    val arrivals = DedupStream.arrivalLog(corpus)

    val cuts = Seq(0L, 150L, 300L, Long.MaxValue)
    var state: Option[DedupStream.PairState] = None
    var verdict: org.apache.spark.sql.DataFrame = null
    cuts.sliding(2).foreach { case Seq(lo, hi) =>
      val batch = survivors.where(col("doc_id") >= lo && col("doc_id") < hi)
      val seen = survivors.where(col("doc_id") < hi)
      val seenArrivals = arrivals // full log; verdict is over all arrivals
      val (v, s) = DedupStream.refreshVerdictIncremental(seen, batch, seenArrivals, state)
      state = Some(s); verdict = v
    }

    def img(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq
    val full = DedupStream.refreshVerdict(survivors, arrivals)
    val batchP36 = graft.pipeline.PipelineOps.dedupVerdictOf(corpus)
    assert(img(verdict) == img(full), "incremental != full recompute")
    assert(img(verdict) == img(batchP36), "incremental != batch p36")
    // and the carried edge set equals the one-shot pair set (same dedup
    // graph, batch boundaries invisible)
    val oneShot = graft.pipeline.PipelineOps.ngramJaccardOf(
        survivors.select("doc_id", "text", "lang", "source", "n_chars"))
      .select("doc_a", "doc_b")
    assert(state.get.pairs.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      oneShot.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
  }

  test("streaming summary refresh converges to the batch aggregate, one file per batch") {
    import java.nio.file.{Files, Paths}
    val tmp = Files.createTempDirectory("graft_refresh").toString
    // split the fact into two files so the merge path runs across batches
    val li = spark.read.parquet(s"$SfDir/lineitem.parquet")
      .select("l_returnflag", "l_shipdate", "l_quantity", "l_extendedprice")
    li.repartition(2).write.mode("overwrite").parquet(s"$tmp/fact")
    assert(Files.list(Paths.get(s"$tmp/fact")).toArray
      .map(_.toString).count(_.endsWith(".parquet")) == 2)

    val schema = li.schema
    val store = s"$tmp/summary"
    val q = SummaryRefresh.run(
      spark, s"$tmp/fact", schema, store, s"$tmp/ckpt",
      keys = Seq("l_returnflag"), meas = Seq(
        SummaryRefresh.MeasureSpec("qty", "l_quantity", "sum"),
        SummaryRefresh.MeasureSpec("n", "1", "sum"),
        SummaryRefresh.MeasureSpec("max_price", "l_extendedprice", "max")))
    try q.processAllAvailable() finally q.stop()

    val got = spark.read.parquet(store).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getDouble(3))).sortBy(_._1)
    val want = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("qty"), count(lit(1)).as("n"),
        max("l_extendedprice").as("max_price"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getDouble(3))).sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("stream-stream attribution join equals the batch interval join over events.parquet") {
    val views = EventStream.readEvents(spark, SfDir).where(col("event_type") === "view")
    val purchases = EventStream.readEvents(spark, SfDir).where(col("event_type") === "purchase")
    val q = EventStream.attributionJoin(views, purchases).writeStream
      .format("memory").queryName("attrib").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("attrib")
        .select("purchase_id", "view_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      val batch = graft.sources.EventsSource.read(spark, SfDir)
        .withColumn("tsu", col("ts"))
      val want = graft.operators.TemporalJoins.intervalJoin(
          points = batch.where(col("event_type") === "view")
            .select(col("user_id"), col("event_id").as("view_id"), col("tsu")),
          intervals = batch.where(col("event_type") === "purchase")
            .select(col("user_id"), col("event_id").as("purchase_id"),
              (col("tsu") - graft.pipeline.PipelineOps.AttribWindowUs).as("lo"),
              col("tsu").as("hi")),
          keys = Seq("user_id"), ptCol = "tsu", loCol = "lo", hiCol = "hi",
          bucketUs = graft.pipeline.PipelineOps.AttribWindowUs)
        .select("purchase_id", "view_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(want.nonEmpty)
      assert(got == want)
    } finally q.stop()
  }

  test("streaming funnel matches a reference fold of the real event stream") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    // real events, delivered per user in event-time order (the contract
    // under which the incremental funnel is exact), split into two triggers
    val evs = graft.sources.EventsSource.read(spark, SfDir)
      .collect()
      .map(r => EventStream.Event(r.getLong(2),
        new Timestamp(r.getLong(1) / 1000L), r.getString(3), r.getDouble(4)))
      .sortBy(e => (e.user_id, e.ts.getTime))
    val (b1, b2) = evs.splitAt(evs.length / 2)

    val input = MemoryStream[EventStream.Event]
    val q = EventStream.funnelStages(input.toDS()).writeStream
      .format("memory").queryName("funnel_stages").outputMode("update").start()
    try {
      input.addData(b1.toSeq: _*); q.processAllAvailable()
      input.addData(b2.toSeq: _*); q.processAllAvailable()
      // update mode emits one row per (user, trigger); the machine is
      // monotone (stage only deepens, lags are set-once), so the deepest
      // stage IS the final state — no reliance on sink scan order
      val got = spark.table("funnel_stages")
        .collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
        .groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).maxBy(_._1) }
        .map { case (u, (st, v2c, c2p)) => (u, st, v2c, c2p) }.toSet

      // driver-side reference: the same first-view/at-or-after machine
      val want = evs.groupBy(_.user_id).map { case (u, es) =>
        var (v, c, p) = (-1L, -1L, -1L)
        es.sortBy(_.ts.getTime).foreach { e =>
          val t = e.ts.getTime
          e.event_type match {
            case "view"     if v < 0 => v = t
            case "click"    if v >= 0 && c < 0 && t >= v => c = t
            case "purchase" if c >= 0 && p < 0 && t >= c => p = t
            case _ =>
          }
        }
        val stage = if (p >= 0) 3L else if (c >= 0) 2L else if (v >= 0) 1L else 0L
        (u, stage, if (c >= 0) c - v else 0L, if (p >= 0) p - c else 0L)
      }.toSet
      assert(got == want)
      assert(want.exists(_._2 == 3L), "fixture should have full conversions")
    } finally q.stop()
  }

  test("sessionization merges within the gap and splits across it") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    val sessions = EventStream.sessionize(input.toDS())
    val q = sessions.writeStream
      .format("memory").queryName("sessions").outputMode("update").start()
    try {
      def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)
      // user 1: two events 10 min apart (one session), then one 90 min later
      // (new session); user 2: a single event
      input.addData(
        EventStream.Event(1L, ts(0), "view", 1.0),
        EventStream.Event(1L, ts(10), "click", 2.0),
        EventStream.Event(2L, ts(5), "view", 5.0))
      q.processAllAvailable()
      input.addData(EventStream.Event(1L, ts(100), "purchase", 7.0))
      q.processAllAvailable()

      val rows = spark.table("sessions")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      // batch 1: user1 open session (2 events, 3.0), user2 open session
      assert(rows.contains((1L, ts(0), 2L, 3.0, true)))
      assert(rows.contains((2L, ts(5), 1L, 5.0, true)))
      // batch 2: user1's first session closed at the gap, new session opened
      assert(rows.contains((1L, ts(0), 2L, 3.0, false)))
      assert(rows.contains((1L, ts(100), 1L, 7.0, true)))
    } finally q.stop()
  }

  test("semantic dedup refresh driven by a live micro-batch stream equals one-shot p44") {
    // the production ingest wiring for SemDedupStream: embeddings arrive
    // through a real streaming query, foreachBatch folds each micro-batch
    // into the carried cell/edge state (seeds fixed up front), and the
    // verdict served from that state must equal the one-shot operator —
    // the same claim p47 proves batch-wise under the DuckDB oracle, here
    // proven under the actual streaming engine's batching
    import spark.implicits._
    import graft.pipeline.PipelineOps
    implicit val sql = spark.sqlContext
    val emb = spark.read.parquet(s"$SfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val rows = emb.collect().map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
    val qAll = PipelineOps.quantizedOf(emb).select(col("vec_id"), col("q"), col("nrm"))
    val cents = PipelineOps.semCents(qAll, PipelineOps.semCells(rows.length.toLong))
      .localCheckpoint(false)

    var state: Option[SemDedupStream.SemState] = None
    val input = MemoryStream[(Long, Seq[Float])]
    val fold: (org.apache.spark.sql.DataFrame, Long) => Unit = (batch, _) =>
      if (!batch.isEmpty) {
        state = Some(SemDedupStream.refreshIncremental(
          cents,
          PipelineOps.quantizedOf(batch).select(col("vec_id"), col("q"), col("nrm")),
          state, PipelineOps.SemMaxCell, PipelineOps.SemDupThreshold))
      }
    val q = input.toDF().toDF("vec_id", "embedding")
      .writeStream.foreachBatch(fold).start()
    try {
      rows.grouped(120).foreach { chunk => input.addData(chunk.toSeq); q.processAllAvailable() }
    } finally q.stop()

    def img(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)), r.getLong(3))).toSeq
    val got = img(SemDedupStream.verdict(
      emb.select("vec_id"), state.get, PipelineOps.SemMaxCell))
    val want = img(PipelineOps.semDedup(spark, SfDir))
    assert(got == want, "stream-refreshed verdict != one-shot p44")
    assert(got.exists(_._4 == 0L), "the fixture must exercise real drops")
  }
}
