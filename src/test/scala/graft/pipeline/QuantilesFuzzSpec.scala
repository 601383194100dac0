package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.spark

/** Fuzzes p42's bin-then-refine selection against a driver-side full sort —
  * the oracle affords the per-group sort the operator exists to avoid.
  * Seeded generators sweep the distribution shapes that stress bucket
  * geometry: uniform, power-law (most mass in few buckets), constant
  * (hi == lo degenerate extent), negatives, heavy duplicates, and
  * single-element groups. Exact rank selection must match on every one —
  * the value at rank ceil(d·n/10) is tie-order-independent, so equality is
  * well-defined with no tolerance. */
class QuantilesFuzzSpec extends AnyFunSuite {

  private def check(name: String, bySource: Map[String, Seq[Long]]): Unit = {
    import spark.implicits._
    val vals = bySource.toSeq.flatMap { case (s, vs) => vs.map(s -> _) }
      .toDF("source", "v")
    val got = PipelineOps.quantilesOf(vals).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    bySource.foreach { case (s, vs) =>
      val sorted = vs.sorted
      val n = sorted.length.toLong
      (1 to PipelineOps.QuantDeciles).foreach { d =>
        val want = sorted((((d * n + 9) / 10) - 1).toInt)
        assert(got((s, d.toLong)) == ((n, want)), s"$name/$s d$d")
      }
    }
    assert(got.size == bySource.size * PipelineOps.QuantDeciles, name)
  }

  test("random distribution shapes match the driver full-sort oracle") {
    val rnd = new scala.util.Random(42)
    (1 to 8).foreach { trial =>
      val shapes = Map(
        "uniform"   -> Seq.fill(200 + rnd.nextInt(200))(rnd.nextLong() % (1L << 40)),
        "powerlaw"  -> Seq.fill(300)(1L << rnd.nextInt(30)),
        "constant"  -> Seq.fill(50)(7L),
        "negative"  -> Seq.fill(120)(-(rnd.nextInt(1 << 20).toLong)),
        "dupes"     -> Seq.fill(250)(rnd.nextInt(5).toLong),
        "singleton" -> Seq(rnd.nextLong() % (1L << 40)))
      check(s"trial$trial", shapes)
    }
  }

  test("p42 stays rank-exact across degenerate bucket-count geometries") {
    import spark.implicits._
    val rnd = new scala.util.Random(21)
    val bySource = Map(
      "a" -> Seq.fill(137)(rnd.nextInt(1000).toLong),
      "b" -> Seq.fill(64)(rnd.nextLong() % (1L << 30)))
    val vals = bySource.toSeq.flatMap { case (s, vs) => vs.map(s -> _) }.toDF("source", "v")
    // nb=1 funnels refine into one bucket (a full per-group sort — correct,
    // just the shape the default avoids); nb >> n leaves most buckets empty
    Seq(1, 2, 7, 4096).foreach { nb =>
      val got = PipelineOps.quantilesOf(vals, nb).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
      bySource.foreach { case (s, vs) =>
        val sorted = vs.sorted; val n = sorted.length.toLong
        (1 to PipelineOps.QuantDeciles).foreach { d =>
          assert(got((s, d.toLong)) == sorted((((d * n + 9) / 10) - 1).toInt), s"nb=$nb $s d$d")
        }
      }
    }
  }

  test("p43 estimate bound holds across declared-domain geometries") {
    import spark.implicits._
    val rnd = new scala.util.Random(22)
    val vs = Seq.fill(200)(rnd.nextInt(2000).toLong - 500) // includes out-of-domain
    val vals = vs.map("s" -> _).toDF("source", "v")
    // (lo, hi, nb): unit-width buckets, one bucket, asymmetric domain, huge span
    Seq((0L, 1023L, 1024), (0L, 1023L, 1), (-500L, 499L, 8), (0L, 1L << 30, 4))
      .foreach { case (lo, hi, nb) =>
        val width = (hi - lo + 1) / nb
        val clamped = vs.map(v => math.min(math.max(v, lo), hi)).sorted
        val n = clamped.length.toLong
        val got = PipelineOps.histQuantilesOf(vals, lo, hi, nb).collect()
          .map(r => r.getLong(1) -> r.getLong(3)).toMap
        (1 to PipelineOps.QuantDeciles).foreach { d =>
          val exact = clamped((((d * n + 9) / 10) - 1).toInt)
          val e = got(d.toLong)
          // +1: when nb does not divide the span, integer bucket edges can
          // overshoot the real-valued width by one
          assert(e > exact - 1 && e <= exact + width + 1,
            s"($lo,$hi,$nb) d$d est=$e exact=$exact width=$width")
        }
      }
  }

  test("adversarial bucket geometry: all mass in one bucket plus outliers") {
    // one extreme outlier stretches the extent so every other value lands
    // in bucket 0 — the refine pass must still rank that bucket exactly
    val rnd = new scala.util.Random(7)
    val vs = Seq.fill(500)(rnd.nextInt(100).toLong) :+ (1L << 50)
    check("outlier", Map("s" -> vs))
  }
}
