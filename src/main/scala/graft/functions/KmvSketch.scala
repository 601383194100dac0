package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** K-minimum-values (KMV) distinct-count sketch — the mergeable sketch
  * family the brief's "novel sketch" slot calls for, and the pattern that
  * makes distinct counts PRE-AGGREGABLE: exact `COUNT(DISTINCT)` is not
  * additive across summary rows (days, segments), so a summary table can
  * never answer "distinct users over an arbitrary date range" — but a
  * per-day KMV sketch column can: sketches union losslessly (merge keeps
  * the k smallest of both), so any rollup re-aggregates the sketch and
  * estimates at the end. This is how warehouse engines ship approximate
  * distinct over cubes (theta/HLL sketch columns); KMV is the simplest
  * member with a clean unbiased estimator (Bar-Yossef et al. 2002,
  * RANDOM'02: "Counting distinct elements in a data stream").
  *
  * Estimator: with h uniform on [0, 2^48) (the engine's 48-bit md5-derived
  * hashes, [[graft.pipeline.Hashing]]), E[k-th smallest / 2^48] = k/(n+1),
  * so n̂ = (k-1)·2^48 / h_(k) (the -1 makes it unbiased). Fewer than k
  * distinct hashes → the sketch IS the distinct set → exact count.
  *
  * Everything is deterministic — the sketch is the sorted set of the k
  * smallest distinct hashes, independent of partitioning and arrival
  * order — so sketch columns are stable under re-aggregation and safe to
  * store in summary tables, and the estimate is IEEE arithmetic over
  * exact integers (cross-engine reproducible; p29 oracle-checks the
  * relational form against DuckDB byte-exact).
  *
  * Scale shape: [[Build]] is an algebraic aggregate — partials of size
  * ≤ k per group per partition, merged shuffle-side like any sum; the
  * input never concentrates. [[MergeSketches]] re-aggregates stored
  * sketch columns (the summary-rollup path) at the same cost.
  */
object KmvSketch {

  val DefaultK = 64

  /** Hash space size: hashes are 48-bit (top 12 hex chars of md5). */
  val HashSpace: Double = 281474976710656.0 // 2^48

  /** Sorted-distinct-bounded insert: the buffer is always sorted, distinct,
    * and at most k long. */
  private[functions] def insert(buf: Array[Long], v: Long, k: Int): Array[Long] = {
    if (buf.length == k && v >= buf(k - 1)) return buf
    val i = java.util.Arrays.binarySearch(buf, v)
    if (i >= 0) return buf // already present
    val at = -i - 1
    val n = math.min(buf.length + 1, k)
    val out = new Array[Long](n)
    System.arraycopy(buf, 0, out, 0, at)
    out(at) = v
    System.arraycopy(buf, at, out, at + 1, n - at - 1)
    out
  }

  /** Merge two sorted-distinct arrays keeping the k smallest. */
  private[functions] def union(a: Array[Long], b: Array[Long], k: Int): Array[Long] = {
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    var last = Long.MinValue; var first = true
    while (o < out.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (first || v != last) { out(o) = v; o += 1; last = v; first = false }
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  /** Sketch builder over pre-hashed int64 input (one hash per element). */
  final case class Build(k: Int = DefaultK) extends Aggregator[Long, Array[Long], Array[Long]] {
    def zero: Array[Long] = Array.emptyLongArray
    def reduce(buf: Array[Long], h: Long): Array[Long] = insert(buf, h, k)
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = union(a, b, k)
    def finish(buf: Array[Long]): Array[Long] = buf
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Re-aggregates stored sketches (the summary-table rollup path). */
  final case class MergeSketches(k: Int = DefaultK)
      extends Aggregator[Array[Long], Array[Long], Array[Long]] {
    def zero: Array[Long] = Array.emptyLongArray
    def reduce(buf: Array[Long], s: Array[Long]): Array[Long] = union(buf, s, k)
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = union(a, b, k)
    def finish(buf: Array[Long]): Array[Long] = buf
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Distinct-count estimate from a sketch column (array<bigint>).
    * Exact below k; (k-1)·2^48 / h_(k) at k. */
  def estimate(sketch: Column, k: Int = DefaultK): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(HashSpace) /
        element_at(sketch, k).cast("double"))
}
