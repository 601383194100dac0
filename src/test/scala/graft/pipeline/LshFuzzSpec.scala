package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.{spark, SfDir}

/** Differential fuzz of the p08 hyperplane-LSH ANN across bucket widths.
  * Same contract as EmbDedupFuzzSpec (the sibling sign-bit operator with
  * disjoint plane indices): [[PipelineOps.annLshParam]] vs a driver-side
  * oracle recomputed from the raw floats — independent quantization, plane
  * dots, bit packing, same-bucket candidate generation, cosine top-3 with
  * the (cosine desc, nbr_id asc) tiebreak. Catches bit-packing and
  * plane-index bugs as functions of the width, including width 1 (two
  * half-space buckets) and widths past the production 12. */
class LshFuzzSpec extends AnyFunSuite {

  private case class Vec(id: Long, q: Array[Long], nrm: Long)

  private lazy val vecs: Vector[Vec] = {
    val rows = spark.read.parquet(s"$SfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
    rows.iterator.map { r =>
      val q = r.getSeq[Float](1).map(x => math.floor(x.toDouble * Hashing.QuantScale).toLong).toArray
      Vec(r.getLong(0), q, q.map(v => v * v).sum)
    }.toVector.sortBy(_.id)
  }

  private def oracle(planes: Int): Vector[(Long, Long, Long, Long, Double)] = {
    val ws = Array.tabulate(planes, Hashing.EmbDim)((p, d) => Hashing.planeWeight(p, d))
    def bucket(q: Array[Long]): Long = {
      var b = 0L
      for (p <- 0 until planes) {
        var dot = 0L; var d = 0
        while (d < Hashing.EmbDim) { dot += q(d) * ws(p)(d); d += 1 }
        if (dot > 0) b |= 1L << p
      }
      b
    }
    val buckets = vecs.map(v => v.id -> bucket(v.q)).toMap
    val out = Vector.newBuilder[(Long, Long, Long, Long, Double)]
    for (q <- vecs.filter(_.id < 10)) {
      val scored = vecs
        .filter(n => n.id != q.id && buckets(n.id) == buckets(q.id))
        .map { n =>
          var dot = 0L; var d = 0
          while (d < Hashing.EmbDim) { dot += q.q(d) * n.q(d); d += 1 }
          (dot.toDouble / (math.sqrt(q.nrm.toDouble) * math.sqrt(n.nrm.toDouble)), n.id)
        }
        .sortBy { case (cos, id) => (-cos, id) }
        .take(3)
      for (((cos, nbr), i) <- scored.zipWithIndex)
        out += ((q.id, (i + 1).toLong, nbr, buckets(q.id), cos))
    }
    out.result()
  }

  // bucket widths around the production 12: width 1 (half-space buckets,
  // maximal candidates), powers through 16 (indices past production), and
  // a wide bucket where queries may have < 3 or zero candidates
  private val Widths = Seq(12, 1, 4, 8, 16, 20)

  for (planes <- Widths)
    test(s"lsh ann at $planes planes matches the driver oracle") {
      val got = PipelineOps.annLshParam(spark, SfDir, planes)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .toVector.sorted
      val want = oracle(planes).sorted
      assert(got == want,
        s"impl=${got.size} oracle=${want.size} rows; " +
          s"impl-only=${(got.toSet -- want.toSet).take(3)} oracle-only=${(want.toSet -- got.toSet).take(3)}")
    }
}
