package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.{spark, SfDir}

/** Differential fuzz of the p04 minhash+LSH pipeline across LSH geometries.
  *
  * The CORRECTNESS gate checks p04 only at the production constants
  * (32 hashes × 16 bands, cap 64, prefilter 8, j ≥ 0.5). This spec runs
  * [[PipelineOps.minhashPairsParam]] over a grid of geometries and compares
  * each run against a driver-side all-pairs oracle recomputed from the RAW
  * TEXT in plain Scala — independent md5, shingling, signature, banding,
  * bucket-cap, prefilter, and Jaccard code sharing nothing with the Spark
  * path but the md5 algorithm itself. A bug in band-slot indexing
  * (`b*rowsPerBand+r`), cap semantics (drop rows in hot buckets, pair
  * survives iff co-bucketed in a ≤cap band), the prefilter bound, or the
  * merge-walk intersect count shows up as a set difference on some grid
  * point even if it cancels out at the production constants.
  *
  * The oracle is exact, not probabilistic: given the deterministic hash
  * family, "pair reported" is a deterministic predicate of (texts, params),
  * so the comparison is equality, no tolerance.
  */
class MinhashFuzzSpec extends AnyFunSuite {

  /** Independent 48-bit md5 hash — deliberately NOT TextHashKernel. */
  private def h48(s: String, mod: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val out = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val v = ((out(0) & 0xffL) << 40) | ((out(1) & 0xffL) << 32) | ((out(2) & 0xffL) << 24) |
      ((out(3) & 0xffL) << 16) | ((out(4) & 0xffL) << 8) | (out(5) & 0xffL)
    if (mod > 0) v % mod else v
  }

  private case class Doc(id: Long, hashes: Array[Long]) // sorted distinct shingle hashes

  /** Raw text → per-doc sorted distinct 2-shingle hash sets, mirroring
    * `shingled`: regex-split on single spaces keeping trailing empties
    * (Spark `split(text, ' ')` semantics), docs with < 2 tokens dropped. */
  private lazy val oracleDocs: Vector[Doc] = {
    val rows = spark.read.parquet(s"$SfDir/documents.parquet")
      .select("doc_id", "text").collect()
    rows.iterator.flatMap { r =>
      val toks = r.getString(1).split(" ", -1)
      if (toks.length < 2) None
      else {
        val shingles = (1 until toks.length).map(i => toks(i - 1) + " " + toks(i)).distinct
        Some(Doc(r.getLong(0),
          shingles.map(h48(_, Hashing.BaseHashMod)).distinct.sorted.toArray))
      }
    }.toVector.sortBy(_.id)
  }

  /** The full pair predicate evaluated directly per pair: candidate iff the
    * two docs share a band bucket of size ≤ cap, then signature agreement ≥
    * minSig, then exact Jaccard ≥ threshold. */
  private def oraclePairs(
      numHashes: Int, bands: Int, cap: Int, minSig: Int,
      threshold: Double): Vector[(Long, Long, Double)] = {
    val rpb = numHashes / bands
    val (ca, cb) = Hashing.minhashCoeffs(numHashes)
    val sigs: Map[Long, Array[Long]] = oracleDocs.map { d =>
      val sig = Array.fill(numHashes)(Long.MaxValue)
      var i = 0
      while (i < d.hashes.length) {
        val h = d.hashes(i)
        var j = 0
        while (j < numHashes) {
          val v = (ca(j) * h + cb(j)) % Hashing.P
          if (v < sig(j)) sig(j) = v
          j += 1
        }
        i += 1
      }
      d.id -> sig
    }.toMap

    def bkey(sig: Array[Long], b: Int): String =
      (b * rpb until (b + 1) * rpb).map(sig).mkString("_")

    val bucketSize = scala.collection.mutable.Map.empty[(Int, String), Int].withDefaultValue(0)
    for (d <- oracleDocs; b <- 0 until bands)
      bucketSize((b, bkey(sigs(d.id), b))) += 1

    def jaccard(a: Array[Long], b: Array[Long]): Double = {
      var i = 0; var j = 0; var inter = 0
      while (i < a.length && j < b.length) {
        if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
        else if (a(i) < b(j)) i += 1
        else j += 1
      }
      inter.toDouble / (a.length + b.length - inter).toDouble
    }

    val out = Vector.newBuilder[(Long, Long, Double)]
    for (ai <- oracleDocs.indices; bi <- ai + 1 until oracleDocs.length) {
      val (da, db) = (oracleDocs(ai), oracleDocs(bi))
      val (sa, sb) = (sigs(da.id), sigs(db.id))
      val coBucketed = (0 until bands).exists { b =>
        val k = bkey(sa, b)
        k == bkey(sb, b) && bucketSize((b, k)) <= cap
      }
      if (coBucketed) {
        val agree = (0 until numHashes).count(j => sa(j) == sb(j))
        if (agree >= minSig) {
          val jac = jaccard(da.hashes, db.hashes)
          if (jac >= threshold) out += ((da.id, db.id, jac))
        }
      }
    }
    out.result()
  }

  // (numHashes, bands, cap, minSig, threshold): the production point, then
  // geometries that perturb each parameter the implementation consumes —
  // wider/narrower bands (slot-indexing arithmetic), 1-row bands (bkey is a
  // single slot), an aggressive cap (hot-bucket drop semantics), a disabled
  // prefilter with a lower threshold (verify stage alone), a prefix-width
  // signature (coefficient prefix property), and a high-precision corner.
  private val Grid = Seq(
    (32, 16, 64, 8, 0.5), // production geometry
    (32, 8, 64, 8, 0.5), // 4 rows/band: high precision, low recall
    (32, 32, 64, 16, 0.5), // 1 row/band: bkey = single signature slot
    (16, 8, 64, 4, 0.5), // narrower signature: coefficient prefix
    (24, 12, 64, 6, 0.4), // non-power-of-two geometry
    (32, 16, 2, 8, 0.5), // aggressive hot-bucket cap
    (32, 16, 64, 0, 0.3), // prefilter disabled, low threshold
    (32, 4, 64, 8, 0.7) // 8 rows/band, high-precision corner
  )

  for ((nh, bands, cap, minSig, thr) <- Grid)
    test(s"minhash LSH geometry $nh×$bands cap=$cap minSig=$minSig j≥$thr matches all-pairs oracle") {
      val got = PipelineOps.minhashPairsParam(spark, SfDir, nh, bands, cap, minSig, thr)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toVector.sorted
      val want = oraclePairs(nh, bands, cap, minSig, thr).sorted
      assert(got == want,
        s"impl=${got.size} oracle=${want.size} pairs; " +
          s"impl-only=${(got.toSet -- want.toSet).take(5)} oracle-only=${(want.toSet -- got.toSet).take(5)}")
      // a grid point that finds nothing tests nothing — every geometry here
      // was chosen to yield pairs on the sf0.001 corpus
      assert(want.nonEmpty, "degenerate grid point: oracle found no pairs")
    }

  test("non-dividing band counts are rejected, not silently truncated") {
    intercept[IllegalArgumentException] {
      PipelineOps.minhashPairsParam(spark, SfDir, 32, 5, 64, 8, 0.5)
    }
  }
}
