package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CheckpointStats
import graft.SparkTestSession.spark

/** [[CheckpointStats.capEstimate]] — the saturation that stops checkpoint
  * stats-squaring (see PipelineOps.truncateLineage / the pinned helper):
  * small estimates must pass through IDENTICALLY (broadcast planning
  * depends on them), absurd ones must saturate at Long.MaxValue, and the
  * rebuild must be contents-preserving. */
class CheckpointStatsSpec extends AnyFunSuite {

  import spark.implicits._

  private def sizeOf(df: org.apache.spark.sql.DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  test("small checkpointed frames pass through untouched, estimate intact") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v").localCheckpoint(true)
    val out = CheckpointStats.capEstimate(df)
    assert(out eq df, "sub-cap frames must be returned as-is (no rebuild)")
    assert(sizeOf(out) <= BigInt(Long.MaxValue))
  }

  test("a squared-past-Long estimate saturates at Long.MaxValue; rows survive") {
    // squaring chain: each round self-joins the checkpointed frame (the
    // size-only estimator multiplies child sizes) and re-checkpoints —
    // exactly the CC-loop shape that overflowed BigInteger pre-fix
    var df = (1L to 3L).toDF("k").localCheckpoint(true)
    var rounds = 0
    while (sizeOf(df) <= BigInt(Long.MaxValue) && rounds < 12) {
      val j = df.as("l").join(df.as("r"), col("l.k") === col("r.k"))
        .select(col("l.k").as("k"))
      df = j.localCheckpoint(true) // checkpoint CAPTURES the join's estimate
      rounds += 1
    }
    assert(sizeOf(df) > BigInt(Long.MaxValue),
      s"fixture failed to inflate the estimate in $rounds rounds")
    val capped = CheckpointStats.capEstimate(df)
    assert(!(capped eq df))
    assert(sizeOf(capped) == BigInt(Long.MaxValue))
    assert(capped.as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // and the cap composes: joins of capped frames stay far from the
    // BigInteger range, so re-capping per truncation bounds growth forever
    val again = capped.as("l").join(capped.as("r"), col("l.k") === col("r.k"))
      .select(col("l.k").as("k")).localCheckpoint(true)
    assert(sizeOf(CheckpointStats.capEstimate(again)) == BigInt(Long.MaxValue))
  }
}
