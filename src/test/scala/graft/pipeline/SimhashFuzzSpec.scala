package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.{spark, SfDir}

/** Differential fuzz of the p35 simhash block-banding pipeline across block
  * geometries — the Manku-style bit-block LSH is only oracle-checked at the
  * production 4 × 12-bit / hamming ≤ 3 point. Same contract as
  * MinhashFuzzSpec: [[PipelineOps.simhashPairsParam]] vs a driver-side
  * all-pairs oracle recomputed from raw text in plain Scala (independent
  * md5, majority-bit fingerprint, block extraction, bucket cap, popcount),
  * exact set equality per grid point. Catches block-shift arithmetic
  * (`fp >> b*blockBits`), mask-width bugs, cap semantics, and the strict-
  * majority tie rule as functions of the geometry. */
class SimhashFuzzSpec extends AnyFunSuite {

  /** Independent 48-bit md5 hash — deliberately NOT TextHashKernel. */
  private def h48(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val out = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((out(0) & 0xffL) << 40) | ((out(1) & 0xffL) << 32) | ((out(2) & 0xffL) << 24) |
      ((out(3) & 0xffL) << 16) | ((out(4) & 0xffL) << 8) | (out(5) & 0xffL)
  }

  /** Raw text → 48-bit strict-majority fingerprint over the token MULTISET
    * (no dedup — repeated tokens vote repeatedly, mirroring StringHashes
    * over the split array). */
  private lazy val oracleFps: Vector[(Long, Long)] = {
    val rows = spark.read.parquet(s"$SfDir/documents.parquet")
      .select("doc_id", "text").collect()
    rows.iterator.map { r =>
      val hashes = r.getString(1).split(" ", -1).map(h48)
      val cnt = new Array[Int](48)
      for (h <- hashes; b <- 0 until 48) cnt(b) += ((h >> b) & 1L).toInt
      var fp = 0L
      for (b <- 0 until 48) if (2 * cnt(b) > hashes.length) fp |= 1L << b
      (r.getLong(0), fp)
    }.toVector.sortBy(_._1)
  }

  private def oraclePairs(
      blocks: Int, blockBits: Int, maxHamming: Int, cap: Int): Vector[(Long, Long, Long)] = {
    val mask = (1L << blockBits) - 1
    def blockVal(fp: Long, b: Int): Long = (fp >> (b * blockBits)) & mask

    val bucketSize = scala.collection.mutable.Map.empty[(Int, Long), Int].withDefaultValue(0)
    for ((_, fp) <- oracleFps; b <- 0 until blocks)
      bucketSize((b, blockVal(fp, b))) += 1

    val out = Vector.newBuilder[(Long, Long, Long)]
    for (ai <- oracleFps.indices; bi <- ai + 1 until oracleFps.length) {
      val (ida, fpa) = oracleFps(ai)
      val (idb, fpb) = oracleFps(bi)
      val coBucketed = (0 until blocks).exists { b =>
        blockVal(fpa, b) == blockVal(fpb, b) && bucketSize((b, blockVal(fpa, b))) <= cap
      }
      if (coBucketed) {
        val hamming = java.lang.Long.bitCount(fpa ^ fpb).toLong
        if (hamming <= maxHamming) out += ((ida, idb, hamming))
      }
    }
    out.result()
  }

  // (blocks, blockBits, maxHamming, cap): the production point, then every
  // covering factorization of 48 the pigeonhole bound admits, a tighter
  // hamming radius, and an aggressive cap.
  private val Grid = Seq(
    (4, 12, 3, 64), // production geometry
    (6, 8, 5, 64), // 8-bit blocks: wider radius, hotter buckets
    (8, 6, 7, 64), // 6-bit blocks: hottest buckets the cap must police
    (3, 16, 2, 64), // 16-bit blocks: high precision
    (2, 24, 1, 64), // minimal geometry
    (4, 12, 1, 64), // radius below the pigeonhole bound
    (4, 12, 3, 2) // aggressive hot-bucket cap
  )

  for ((blocks, bits, maxH, cap) <- Grid)
    test(s"simhash blocks $blocks×${bits}b hamming≤$maxH cap=$cap matches all-pairs oracle") {
      val got = PipelineOps.simhashPairsParam(spark, SfDir, blocks, bits, maxH, cap)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toVector.sorted
      val want = oraclePairs(blocks, bits, maxH, cap).sorted
      assert(got == want,
        s"impl=${got.size} oracle=${want.size} pairs; " +
          s"impl-only=${(got.toSet -- want.toSet).take(5)} oracle-only=${(want.toSet -- got.toSet).take(5)}")
      assert(want.nonEmpty, "degenerate grid point: oracle found no pairs")
    }

  test("invalid geometries are rejected, not silently unsound") {
    intercept[IllegalArgumentException] {
      PipelineOps.simhashPairsParam(spark, SfDir, 4, 10, 3, 64) // 40 < 48 bits covered
    }
    intercept[IllegalArgumentException] {
      PipelineOps.simhashPairsParam(spark, SfDir, 4, 12, 4, 64) // radius ≥ blocks
    }
  }
}
