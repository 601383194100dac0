package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming over the `events` table shape: the input operators a
  * production event pipeline needs — watermarked windowed aggregation and
  * stateful sessionization — expressed with `readStream` → transforms →
  * `writeStream`.
  *
  * (The reference only streams HTTP *result* blocks — format_stream.rs —
  * so this module is part of the engine's beyond-parity streaming surface.
  * Scale notes: windowed aggs shuffle on (window, key) with state bounded
  * by the watermark horizon; sessionization state is per-user and expires
  * via event-time timeout.)
  */
object EventStream {

  /** events.parquet wire schema; `ts` takes whatever flavor the files carry
    * (TIMESTAMP(NANOS)-as-long or TIMESTAMP_NTZ — see
    * [[graft.sources.EventsSource]]), probed from a footer before the
    * stream starts (streaming sources need a declared schema). */
  def eventSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  final case class Event(user_id: Long, ts: java.sql.Timestamp, event_type: String, value: Double)
  final case class SessionState(start: Long, lastTs: Long, n: Long, totalValue: Double)
  final case class Session(user_id: Long, session_start: java.sql.Timestamp, n_events: Long, total_value: Double, open: Boolean)

  /** Streaming source over a parquet events directory; `ts` lands as a
    * proper event-time TIMESTAMP (exact µs) whatever the file flavor. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val tsType = graft.sources.EventsSource.tsFileType(spark, dir)
    spark.readStream
      .schema(eventSchema(tsType))
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(graft.sources.EventsSource.tsMicros(tsType)))
  }

  /** Watermarked per-day/type rollup: count + DECIMAL-summed value (same
    * determinism rule as the batch side). State for a window is dropped one
    * hour past the watermark. */
  def windowedStats(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("window.start").as("day"), col("event_type"), col("n"), col("sum_value"))

  /** Streaming exact dedup: drops replayed events by id, with state bounded
    * by the watermark horizon (the streaming twin of the batch content-hash
    * dedup, PipelineOps.exactDedup). */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join — the streaming twin of the batch
    * attribution join (PipelineOps.intervalAttribution / p26): views in the
    * hour before each purchase of the same user. The event-time range
    * condition plus both watermarks let Spark bound the join state: a
    * buffered view can be dropped once the purchase watermark passes
    * `view.ts + 1 hour`, a purchase once the view watermark passes its ts
    * (Structured Streaming's stream-stream inner-join state cleanup). No
    * unbounded buffering at any scale — state is watermark-horizon-sized. */
  def attributionJoin(views: DataFrame, purchases: DataFrame): DataFrame = {
    val v = views.select(
        col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("v_ts"), col("value"))
      .withWatermark("v_ts", "1 hour")
    val p = purchases.select(
        col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    v.join(p,
      expr("v_user = p_user AND v_ts >= p_ts - INTERVAL 1 HOUR AND v_ts <= p_ts"))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("view_id"),
        col("p_ts"), col("v_ts"), col("value"))
  }

  final case class FunnelState(vTs: Long, cTs: Long, pTs: Long)
  final case class FunnelProgress(
      user_id: Long, stage: Long, v2c_ms: Long, c2p_ms: Long)

  /** Streaming conversion funnel — the incremental twin of the batch
    * operator (PipelineOps.funnel / p33): per user, the first view, the
    * first click at-or-after it, the first purchase at-or-after that,
    * emitted as the user's current deepest stage each trigger
    * (KeyValueGroupedDataset.mapGroupsWithState, update mode).
    *
    * State is three int64 timestamps per user — bytes, not buffered events
    * — so it never grows with traffic, only with the user population (the
    * property that makes a funnel streamable at all; buffering events per
    * user would be watermark-unbounded). Matches the batch result exactly
    * when each user's events arrive in event-time order across triggers
    * (within a trigger they are sorted here); an out-of-order view arriving
    * AFTER a later view was recorded re-anchors nothing — the incremental
    * trade every streaming funnel makes. */
  def funnelStages(events: Dataset[Event]): Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (userId: Long, rows: Iterator[Event], state: GroupState[FunnelState]) => {
          var s = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
          rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
            val t = e.ts.getTime
            e.event_type match {
              case "view"     if s.vTs < 0 => s = s.copy(vTs = t)
              case "click"    if s.vTs >= 0 && s.cTs < 0 && t >= s.vTs => s = s.copy(cTs = t)
              case "purchase" if s.cTs >= 0 && s.pTs < 0 && t >= s.cTs => s = s.copy(pTs = t)
              case _ => // wrong order for the funnel, or stage already filled
            }
          }
          state.update(s)
          val stage = if (s.pTs >= 0) 3L else if (s.cTs >= 0) 2L else if (s.vTs >= 0) 1L else 0L
          FunnelProgress(userId, stage,
            if (s.cTs >= 0) s.cTs - s.vTs else 0L,
            if (s.pTs >= 0) s.pTs - s.cTs else 0L)
        })
  }

  /** Session gap in event time. */
  val SessionGapMs: Long = 30 * 60 * 1000L

  /** Stateful sessionization: events of one user within a 30-minute gap
    * merge into a session (KeyValueGroupedDataset.flatMapGroupsWithState,
    * event-time timeout). Emits the updated open session each trigger and
    * the closed session when the gap elapses past the watermark. */
  def sessionize(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, new java.sql.Timestamp(s.start), s.n, s.totalValue, open = false))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var out = Vector.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastTs <= SessionGapMs =>
                  cur = Some(SessionState(s.start, math.max(s.lastTs, t), s.n + 1, s.totalValue + e.value))
                case Some(s) => // gap exceeded: close the old session, open a new one
                  out :+= Session(userId, new java.sql.Timestamp(s.start), s.n, s.totalValue, open = false)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastTs + SessionGapMs)
              out :+= Session(userId, new java.sql.Timestamp(s.start), s.n, s.totalValue, open = true)
            }
            out.iterator
          }
        })
  }
}
