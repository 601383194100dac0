package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.{spark, SfDir}

/** Builds EVERY SparkEntry query against the live testdata — DataFrame
  * construction runs full Catalyst analysis, so any drift between the
  * driver-written parquet and the operators (a column gone, a type flavor
  * flipped — e.g. events.ts moving TIMESTAMP(NANOS) → TIMESTAMP_NTZ between
  * rounds) fails HERE, in the local suite, instead of surfacing for the
  * first time inside the driver's round-end bench/verify run where a single
  * AnalysisException voids the whole snapshot. Analysis-only on purpose:
  * execution correctness belongs to the per-operator specs and the DuckDB
  * oracle gate; this net just has to be cheap enough to always run. */
class EntrySmokeSpec extends AnyFunSuite {

  test("every queries() entry analyzes against the current testdata") {
    val failed = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, SfDir).queryExecution.analyzed; None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.linesIterator.next()}") }
    }
    assert(failed.isEmpty, s"queries failing analysis:\n${failed.mkString("\n")}")
  }

  test("every oracle key names a query, and the flagship entry runs") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql keys without a queries entry: $orphans")
    assert(SparkEntry.entry(spark).limit(1).count() == 1L)
  }
}
