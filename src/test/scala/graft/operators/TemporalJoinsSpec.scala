package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** TemporalJoins correctness against brute-force theta-join reference
  * implementations on data small enough to cross-product. */
class TemporalJoinsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case r: org.apache.spark.sql.Row => r.toSeq
      case x => x
    }).toSet

  // (key, ts, id): left probes, right builds
  private lazy val left = Seq(
    ("a", 10L, 1L), ("a", 20L, 2L), ("a", 30L, 3L),
    ("b", 10L, 4L), ("b", 11L, 5L),
    ("c", 5L, 6L) // key with no right rows at all
  ).toDF("k", "tsu", "lid")

  private lazy val right = Seq(
    ("a", 10L, 100L, 1.5), ("a", 15L, 101L, 2.5), ("a", 15L, 102L, 3.5),
    ("a", 40L, 103L, 9.9),
    ("b", 11L, 104L, 4.5)
  ).toDF("k", "tsu", "rid", "v")

  /** Reference as-of: theta join + keep the max-(ts, rid) match. */
  private def bruteAsof(strict: Boolean): Set[(String, Long, Option[Long])] = {
    val l = left.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val r = right.collect().map(r0 => (r0.getString(0), r0.getLong(1), r0.getLong(2)))
    l.map { case (k, ts, lid) =>
      val cand = r.filter(x => x._1 == k && (if (strict) x._2 < ts else x._2 <= ts))
      (k, lid, if (cand.isEmpty) None else Some(cand.maxBy(x => (x._2, x._3))._3))
    }.toSet
  }

  test("asofJoin matches brute force (inclusive)") {
    val got = TemporalJoins.asofJoin(left, right, Seq("k"), "tsu",
        payload = Seq("rid", "v"), tieBreak = Seq("rid"))
      .select($"k", $"lid", $"asof.rid")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).toSet
    assert(got == bruteAsof(strict = false))
  }

  test("asofJoin matches brute force (strict) — equal-ts right rows invisible") {
    val got = TemporalJoins.asofJoin(left, right, Seq("k"), "tsu",
        payload = Seq("rid"), tieBreak = Seq("rid"), strict = true)
      .select($"k", $"lid", $"asof.rid")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).toSet
    assert(got == bruteAsof(strict = true))
  }

  test("asofJoin payload struct is atomic — ts and value come from one row") {
    val got = TemporalJoins.asofJoin(left, right, Seq("k"), "tsu",
        payload = Seq("rid", "v"), tieBreak = Seq("rid"))
      .where($"asof".isNotNull)
      .select($"asof.ts", $"asof.rid", $"asof.v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val rightRows = right.collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got.subsetOf(rightRows), s"matched payloads $got must be whole right rows")
  }

  test("asofJoin left columns pass through and unmatched rows keep null struct") {
    val out = TemporalJoins.asofJoin(left, right, Seq("k"), "tsu",
      payload = Seq("rid"), tieBreak = Seq("rid"))
    assert(out.count() == left.count())
    assert(out.where($"k" === "c").select($"asof").head().isNullAt(0))
  }

  // intervals: (key, iid, lo, hi); points: (key, pid, ts)
  private lazy val intervals = Seq(
    ("a", 1L, 10L, 20L), ("a", 2L, 15L, 40L), ("a", 3L, 90L, 95L),
    ("b", 4L, 0L, 5L)
  ).toDF("k", "iid", "lo", "hi")

  private lazy val points = Seq(
    ("a", 10L, 10L), ("a", 11L, 17L), ("a", 12L, 39L), ("a", 13L, 50L),
    ("b", 14L, 5L), ("b", 15L, 6L)
  ).toDF("k", "pid", "tsu")

  private def bruteInterval: Set[(Long, Long)] = {
    val is = intervals.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ps = points.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    (for {
      (ik, iid, lo, hi) <- is
      (pk, pid, ts) <- ps
      if ik == pk && ts >= lo && ts <= hi
    } yield (iid, pid)).toSet
  }

  test("intervalJoin matches brute force at several bucket widths") {
    // width below, at, and above the max span — correctness must not
    // depend on the performance knob
    for (bucket <- Seq(3L, 25L, 1000L)) {
      val got = TemporalJoins.intervalJoin(points, intervals, Seq("k"),
          "tsu", "lo", "hi", bucketUs = bucket)
        .select($"iid", $"pid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == bruteInterval, s"bucket=$bucket")
    }
  }

  test("intervalJoin emits no duplicate pairs when an interval spans many cells") {
    val got = TemporalJoins.intervalJoin(points, intervals, Seq("k"),
        "tsu", "lo", "hi", bucketUs = 2L)
      .select($"iid", $"pid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.distinct.length)
    assert(got.toSet == bruteInterval)
  }

  test("p25 as-of pipeline shuffles once on the key (agg reuses the window partitioning)") {
    val plan = graft.pipeline.PipelineOps.queries("p25_asof")(spark, graft.SparkTestSession.SfDir)
      .queryExecution.executedPlan.toString
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashExchanges == 1,
      s"expected exactly 1 hash shuffle (window + agg share user_id partitioning), got $hashExchanges:\n$plan")
  }

  test("intervalJoin plan is an equi-join (hash-partitionable), not a cross product") {
    val plan = TemporalJoins.intervalJoin(points, intervals, Seq("k"),
        "tsu", "lo", "hi", bucketUs = 25L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
