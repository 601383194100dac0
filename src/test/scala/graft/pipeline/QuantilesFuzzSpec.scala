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

  test("adversarial bucket geometry: all mass in one bucket plus outliers") {
    // one extreme outlier stretches the extent so every other value lands
    // in bucket 0 — the refine pass must still rank that bucket exactly
    val rnd = new scala.util.Random(7)
    val vs = Seq.fill(500)(rnd.nextInt(100).toLong) :+ (1L << 50)
    check("outlier", Map("s" -> vs))
  }
}
