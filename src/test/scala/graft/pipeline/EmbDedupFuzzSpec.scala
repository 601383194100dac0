package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.spark

/** Differential fuzz of the p14 hyperplane-LSH embedding dedup across
  * geometries (band count, sign bits per band, hot-bucket cap, cosine
  * threshold). Same contract as MinhashFuzzSpec / SimhashFuzzSpec:
  * [[PipelineOps.embDedupParam]] vs a driver-side all-pairs oracle
  * recomputed from the RAW FLOAT embeddings in plain Scala — independent
  * quantization, plane dots, bit packing, bucket cap, and cosine. Exact
  * double equality holds because both sides quantize to int64 first and
  * then perform the identical double ops in the identical order.
  *
  * Runs on the sf0.1 fixture (2 000 vectors): the 500-vector fixtures
  * yield ≤ 1 pair at any sane geometry, which tests nothing. Two grid
  * points intentionally produce EMPTY results — one where every bucket
  * overflows the cap (the degenerate-corpus guard path) and one where
  * candidates exist but none clear the threshold (verify-stage rejection)
  * — so emptiness is asserted as equality, not skipped. */
class EmbDedupFuzzSpec extends AnyFunSuite {

  private val Dir = "/root/testdata/sf0.1"

  private case class Vec(id: Long, q: Array[Long], nrm: Long)

  private lazy val oracleVecs: Vector[Vec] = {
    val rows = spark.read.parquet(s"$Dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
    rows.iterator.map { r =>
      val emb = r.getSeq[Float](1)
      assert(emb.length == Hashing.EmbDim, s"fixture dim ${emb.length}")
      val q = emb.map(x => math.floor(x.toDouble * Hashing.QuantScale).toLong).toArray
      Vec(r.getLong(0), q, q.map(v => v * v).sum)
    }.toVector.sortBy(_.id)
  }

  private def oraclePairs(
      bands: Int, nbits: Int, cap: Int, threshold: Double): Vector[(Long, Long, Double)] = {
    // plane weights materialized once per (band, bit); inner loops stay
    // unboxed — the all-pairs oracle is O(n²·dim) and dominates suite time
    val planes = Array.tabulate(bands, nbits) { (b, i) =>
      Array.tabulate(Hashing.EmbDim)(d => Hashing.planeWeight(PipelineOps.dedupPlaneIdx(b, i), d))
    }
    def bandKey(q: Array[Long], b: Int): Long = {
      var key = 0L
      var i = 0
      while (i < nbits) {
        val w = planes(b)(i)
        var dot = 0L; var d = 0
        while (d < Hashing.EmbDim) { dot += q(d) * w(d); d += 1 }
        if (dot > 0) key |= 1L << i
        i += 1
      }
      key
    }

    val keys: Map[Long, Array[Long]] =
      oracleVecs.map(v => v.id -> Array.tabulate(bands)(bandKey(v.q, _))).toMap
    val bucketSize = scala.collection.mutable.Map.empty[(Int, Long), Int].withDefaultValue(0)
    for (v <- oracleVecs; b <- 0 until bands) bucketSize((b, keys(v.id)(b))) += 1

    val out = Vector.newBuilder[(Long, Long, Double)]
    for (ai <- oracleVecs.indices; bi <- ai + 1 until oracleVecs.length) {
      val (va, vb) = (oracleVecs(ai), oracleVecs(bi))
      val coBucketed = (0 until bands).exists { b =>
        keys(va.id)(b) == keys(vb.id)(b) && bucketSize((b, keys(va.id)(b))) <= cap
      }
      if (coBucketed) {
        var dot = 0L; var d = 0
        while (d < Hashing.EmbDim) { dot += va.q(d) * vb.q(d); d += 1 }
        val cos = dot.toDouble / (math.sqrt(va.nrm.toDouble) * math.sqrt(vb.nrm.toDouble))
        if (cos >= threshold) out += ((va.id, vb.id, cos))
      }
    }
    out.result()
  }

  // (bands, nbits, cap, threshold, expectPairs): production at this fixture
  // size (dedupBits(2000) = 8), then geometries perturbing each parameter.
  // Measured oracle yields: 21 / 41 / 30 / 21 / 326 / 0 / 0 pairs.
  private val Grid = Seq(
    (3, 8, 64, 0.45, true), // production geometry at this fixture size
    (3, 6, 64, 0.45, true), // coarser buckets: ~4x the candidate volume
    (6, 8, 64, 0.45, true), // doubled bands: exercises plane indices 64..303
    (3, 8, 16, 0.45, true), // tighter cap: drops ~5k candidates, keeps all pairs
    (3, 10, 64, 0.3, true), // finer buckets, lower threshold: 300+ pairs
    (2, 12, 64, 0.5, false), // candidates exist, none clear the threshold
    (1, 4, 64, 0.45, false) // 16 buckets for 2k vecs: every bucket capped
  )

  for ((bands, nbits, cap, thr, expectPairs) <- Grid)
    test(s"emb dedup $bands bands × ${nbits}b cap=$cap cos≥$thr matches all-pairs oracle") {
      val got = PipelineOps.embDedupParam(spark, Dir, bands, nbits, cap, thr)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toVector.sorted
      val want = oraclePairs(bands, nbits, cap, thr).sorted
      assert(got == want,
        s"impl=${got.size} oracle=${want.size} pairs; " +
          s"impl-only=${(got.toSet -- want.toSet).take(5)} oracle-only=${(want.toSet -- got.toSet).take(5)}")
      assert(want.nonEmpty == expectPairs,
        s"grid point yield changed: expected pairs=$expectPairs, oracle found ${want.size}")
    }

  test("nbits beyond the disjoint plane stride is rejected") {
    intercept[IllegalArgumentException] {
      PipelineOps.embDedupParam(spark, Dir, 3, PipelineOps.DedupMaxBits + 1, 64, 0.45)
    }
  }
}
