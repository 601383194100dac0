package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.spark

/** Differential fuzz for p66's exact per-source threshold selection: the
  * histogram + running-cumsum pick of the k-th-smallest score (k = ⌈n/4⌉)
  * must equal a driver sort-and-index oracle on every geometry the
  * histogram path could get wrong — heavy ties AT the threshold, all-equal
  * scores, negative scores, single-doc sources, and sources whose score
  * domain is a single value repeated. */
class CalibratedFilterFuzzSpec extends AnyFunSuite {

  // (source, score, n_chars, n_tokens) rows as tuples — an inner case
  // class has no stable outer scope for Spark's encoder
  private type Doc = (String, Long, Long, Long)
  private def Doc(source: String, score: Long, nChars: Long, nTokens: Long): Doc =
    (source, score, nChars, nTokens)

  private def oracle(docs: Seq[Doc]): Map[String, (Long, Long, Long, Long, Long)] =
    docs.groupBy(_._1).map { case (src, ds) =>
      val n = ds.length.toLong
      val k = (n * PipelineOps.CalibDropPct + 99) / 100
      val threshold = ds.map(_._2).sorted.apply((k - 1).toInt)
      val kept = ds.filter(_._2 >= threshold)
      src -> ((threshold, n, kept.length.toLong,
        kept.map(_._3).sum, kept.map(_._4).sum))
    }

  private def run(docs: Seq[Doc]): Map[String, (Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    val df = docs.toDF("source", "score", "n_chars", "n_tokens")
    PipelineOps.calibratedFilterOf(df).collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    }.toMap
  }

  private def check(tag: String, docs: Seq[Doc]): Unit =
    assert(run(docs) == oracle(docs), tag)

  test("hand-built degenerate geometries match the sort oracle") {
    check("single doc", Seq(Doc("a", 5, 10, 3)))
    check("single negative doc", Seq(Doc("a", -7, 10, 3)))
    check("all-equal scores", (1 to 9).map(i => Doc("a", 4, i.toLong, 2)))
    check("two values split at the quartile",
      (1 to 3).map(i => Doc("a", 1, i.toLong, 1)) ++ (1 to 9).map(i => Doc("a", 2, i.toLong, 1)))
    check("ties exactly at k", // n=8, k=2 → threshold is the 2nd smallest
      Seq(Doc("a", 0, 1, 1), Doc("a", 0, 2, 1), Doc("a", 0, 3, 1)) ++
        (1 to 5).map(i => Doc("a", 9, i.toLong, 1)))
    check("negative-heavy mix",
      Seq(-5L, -5L, -1L, 0L, 0L, 3L, 3L, 3L, 8L).zipWithIndex.map { case (s, i) =>
        Doc("a", s, i.toLong + 1, 1)
      })
    check("multiple sources, one single-doc",
      Seq(Doc("a", 1, 1, 1), Doc("a", 2, 2, 1), Doc("a", 3, 3, 1), Doc("a", 4, 4, 1),
        Doc("b", 100, 5, 9), Doc("c", -2, 6, 1), Doc("c", -2, 7, 1)))
  }

  test("randomized geometries match the sort oracle") {
    val rnd = new scala.util.Random(1313)
    for (trial <- 1 to 12) {
      val nSources = 1 + rnd.nextInt(4)
      val docs = (0 until nSources).flatMap { s =>
        val n = 1 + rnd.nextInt(40)
        // small score domain forces heavy ties; shifted to allow negatives
        (0 until n).map(_ =>
          Doc(s"s$s", rnd.nextInt(8).toLong - 3, rnd.nextInt(500).toLong + 1,
            rnd.nextInt(50).toLong + 1))
      }
      check(s"trial $trial", docs)
    }
  }
}
