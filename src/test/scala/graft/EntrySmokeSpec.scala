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

  test("all scale factors share one schema per table") {
    // the analysis net above runs at sf0.001; a flavor change present only
    // at a bigger SF would still pass it and die in the sf0.1 bench — so
    // pin that the driver wrote the same types at every scale
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tables.foreach { t =>
      val schemas = dirs.map(d => d -> spark.read.parquet(s"$d/$t.parquet").schema)
      schemas.tail.foreach { case (d, s) =>
        assert(s == schemas.head._2, s"$t schema differs between ${schemas.head._1} and $d")
      }
    }
  }

  test("every oracle key names a query, and the flagship entry runs") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql keys without a queries entry: $orphans")
    assert(SparkEntry.entry(spark).limit(1).count() == 1L)
  }
}
