package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Caps the ESTIMATED statistics a checkpoint captures from its origin plan.
  *
  * `Dataset.checkpoint`/`localCheckpoint` wrap the materialized RDD in a
  * [[LogicalRDD]] carrying `Some(originPlan.stats)` so downstream planning
  * keeps broadcast decisions. Under ITERATED self-joins — the connected-
  * components / spanning-forest loops, and maintained state folded through
  * repeated ingest bumps — that capture compounds: the size-only estimator
  * multiplies child sizes per join, so a checkpoint-fed-into-a-join-fed-into-
  * a-checkpoint chain SQUARES the carried estimate every round. After ~25
  * accumulated squarings the `BigInt` exceeds `BigInteger`'s supported range
  * (2³¹−1 bits) and *planning itself* throws `ArithmeticException`.
  *
  * The fix is a saturation cap, not a reset: estimates at or below
  * `Long.MaxValue` bytes pass through untouched (delta-sized frames keep
  * their real sizes, so broadcast planning is unaffected), while anything
  * beyond — already past physical meaning; no broadcast threshold is within
  * ten orders of magnitude of it — saturates at `Long.MaxValue`. Re-capping
  * at every lineage truncation bounds the between-truncation growth to a
  * handful of multiplications of 64-bit values, which a `BigInt` absorbs
  * forever.
  *
  * Zero-copy: the rebuilt [[LogicalRDD]] reuses the checkpointed RDD, output
  * attributes, partitioning and ordering — only the captured statistics
  * change. Compiled into the sql package namespace (the same sanctioned
  * extension point as [[ColumnBridge]]) because the `LogicalRDD`
  * constructor and `Dataset.ofRows` are `private[sql]`. */
object CheckpointStats {
  private val Cap = BigInt(Long.MaxValue)
  // log the first cap per JVM: a fired cap means some loop's estimates
  // had already left physical meaning, and the rebuilt node drops the
  // origin's constraint set — operators should be able to see it happened
  private val warned = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** The saturated statistics, or None when `st` is already within range. */
  private def cappedStats(st: Statistics): Option[Statistics] =
    if (st.sizeInBytes <= Cap) None
    else Some(Statistics(
      sizeInBytes = Cap,
      rowCount = st.rowCount.map(_.min(Cap)),
      attributeStats = st.attributeStats,
      isRuntime = st.isRuntime))

  /** Zero-copy [[LogicalRDD]] rebuild carrying `stats` and NO origin
    * constraints — they are a planning optimization, and the origin
    * ExpressionSet is not reachable through any public accessor on the
    * rebuilt node's fields. The single copy of the reconstruction both
    * public entry points share. */
  private def rebuilt(
      ds: Dataset[org.apache.spark.sql.Row],
      lr: LogicalRDD,
      stats: Statistics): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(
      ds.sparkSession,
      new LogicalRDD(
        lr.output, lr.rdd, lr.outputPartitioning, lr.outputOrdering,
        lr.isStreaming, lr.getStream)(ds.sparkSession, Some(stats), None))

  def capEstimate(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[Dataset[org.apache.spark.sql.Row]]
    ds.queryExecution.logical match {
      case lr: LogicalRDD =>
        cappedStats(lr.computeStats()) match {
          case None => df
          case Some(capped) =>
            if (warned.compareAndSet(false, true))
              org.slf4j.LoggerFactory.getLogger(getClass)
                .warn(s"checkpoint size estimate exceeds Long.MaxValue; " +
                  "saturating (planning-only: compounded estimate, not data " +
                  "size). Capped frames lose inferred constraints. Logged " +
                  "once per JVM.")
            rebuilt(ds, lr, capped)
        }
      case _ => df
    }
  }

  /** Rebuild a checkpointed frame's [[LogicalRDD]] with NO origin
    * constraints (statistics kept, capped as [[capEstimate]]).
    *
    * Why it exists: `Dataset.localCheckpoint` stashes the ORIGIN plan's
    * constraint set on the rebuilt node, and Spark 4's `Union` constraint
    * rewrite (`UnionBase.rewriteConstraints`) looks every constraint
    * attribute up in a child-output map — a stashed constraint that
    * references an attribute outside the checkpoint's output (observed on
    * the driver-composed refresh's InSet/alias-heavy plans composing with
    * the maintained-state unions: `key not found: node#NNN`) kills
    * planning of any union the checkpoint later joins into. Constraints
    * are a planning optimization, never semantics, so the refresh output
    * pins drop them at the truncation boundary. */
  def dropConstraints(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[Dataset[org.apache.spark.sql.Row]]
    ds.queryExecution.logical match {
      case lr: LogicalRDD =>
        val st = lr.computeStats()
        rebuilt(ds, lr, cappedStats(st).getOrElse(st))
      case _ => df
    }
  }
}
