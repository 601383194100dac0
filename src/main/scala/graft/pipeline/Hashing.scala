package graft.pipeline

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Deterministic hash constants shared by the Spark operators and the
  * generated DuckDB oracle SQL.
  *
  * Every derived hash bottoms out in md5 hex (identical in Spark's `md5`,
  * DuckDB's `md5`, and JVM MessageDigest), and every permutation/plane
  * constant is materialized here and inlined as a literal on both sides, so
  * the minhash/LSH pipelines are bit-reproducible across engines — no
  * engine-private hash (murmur3/xxhash) appears in any oracle-checked path.
  */
object Hashing {

  /** Modulus for minhash permutations: 2^31 - 1 (prime). */
  val P: Long = 2147483647L

  /** Token/shingle base hashes are folded into [0, 2^30) so `a*h + b` stays
    * far inside Int64 for any a,b below 2^30 (DuckDB raises on overflow;
    * Spark wraps silently — staying exact keeps both identical). */
  val BaseHashMod: Long = 1L << 30

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** First `n` hex chars of md5(s) as a non-negative Long (n <= 15). */
  def md5Long(s: String, n: Int): Long = java.lang.Long.parseLong(md5Hex(s).take(n), 16)

  // ------------------------------------------------------------- minhash
  val NumHashes = 32
  val Bands     = 16
  val RowsPerBand: Int = NumHashes / Bands

  /** LSH band buckets larger than this are dropped before pairing —
    * low-information collisions whose O(n²) pair blowup is the LSH skew
    * failure mode; near-dups still collide in other bands. */
  val MaxBucketSize = 64

  /** Candidates must agree on at least this many of the 32 signature slots
    * (estimated Jaccard ≥ 8/32) before exact verification. */
  val MinSigMatches = 8

  /** Permutation coefficients for an n-slot signature, h_j(x) = (a_j * x +
    * b_j) mod P, md5-derived — any width's coefficients are a prefix of any
    * wider one's, so fuzzed LSH geometries share the production constants. */
  def minhashCoeffs(n: Int): (IndexedSeq[Long], IndexedSeq[Long]) =
    ((0 until n).map(j => (md5Long(s"graft_a$j", 8) % BaseHashMod) | 1L),
      (0 until n).map(j => md5Long(s"graft_b$j", 8) % BaseHashMod))

  /** Permutation h_j(x) = (a_j * x + b_j) mod P, constants md5-derived. */
  val minhashA: IndexedSeq[Long] = minhashCoeffs(NumHashes)._1
  val minhashB: IndexedSeq[Long] = minhashCoeffs(NumHashes)._2

  // ------------------------------------------------- random-hyperplane LSH
  val LshPlanes = 12
  val EmbDim    = 64

  /** Plane weights in [-1000, 1000], md5-derived: w(p,d). */
  def planeWeight(p: Int, d: Int): Long = md5Long(s"graft_w${p}_$d", 8) % 2001L - 1000L

  /** Embedding quantization scale: floor(x * 1e5) per component keeps
    * 64-dim squared norms below 2^53 so later double conversions are exact. */
  val QuantScale: Long = 100000L
}
