package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

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

  /** Shared scaffolding for the two sketch aggregates below. They are
    * native `TypedImperativeAggregate`s rather than `udaf(Aggregator)`
    * wrappers: both run under ObjectHashAggregateExec either way (an
    * object-state aggregate can't live in an unsafe row buffer), but the
    * native form evaluates its input with `child.eval` directly and
    * serializes partials as packed big-endian longs (ByteBuffer's
    * default order; serialize/deserialize are symmetric) — no
    * ExpressionEncoder round-trip per input row or per shuffle buffer,
    * which is the q47/q44 constant factor. State stays ≤ k longs. */
  sealed abstract class KmvAgg extends TypedImperativeAggregate[Array[Long]]
      with UnaryLike[Expression]
      with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
    def k: Int
    final override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray
    final override def merge(buffer: Array[Long], input: Array[Long]): Array[Long] =
      union(buffer, input, k)
    final override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)
    final override def serialize(buffer: Array[Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(buffer.length * 8)
      var i = 0
      while (i < buffer.length) { bb.putLong(buffer(i)); i += 1 }
      bb.array()
    }
    final override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val bb = ByteBuffer.wrap(bytes)
      val out = new Array[Long](bytes.length / 8)
      var i = 0
      while (i < out.length) { out(i) = bb.getLong(); i += 1 }
      out
    }
    final override def dataType: DataType = ArrayType(LongType, containsNull = false)
    final override def nullable: Boolean = false
  }

  /** Sketch builder over pre-hashed int64 input (one hash per element). */
  final case class Build(
      child: Expression,
      k: Int = DefaultK,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0) extends KmvAgg {
    override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v == null) buffer else insert(buffer, v.asInstanceOf[Long], k)
    }
    override def inputTypes = Seq(LongType)
    override def withNewMutableAggBufferOffset(n: Int): Build = copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): Build = copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(newChild: Expression): Build = copy(child = newChild)
    override def prettyName: String = "kmv_build"
  }

  /** Re-aggregates stored sketches (the summary-table rollup path). */
  final case class MergeSketches(
      child: Expression,
      k: Int = DefaultK,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0) extends KmvAgg {
    override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v == null) return buffer
      val ad = v.asInstanceOf[ArrayData]
      val n = ad.numElements()
      // stored sketches are sorted-distinct non-null; tolerate null slots
      // from a containsNull=true parquet schema by skipping them
      val tmp = new Array[Long](n)
      var i = 0; var m = 0
      while (i < n) {
        if (!ad.isNullAt(i)) { tmp(m) = ad.getLong(i); m += 1 }
        i += 1
      }
      union(buffer, if (m == n) tmp else java.util.Arrays.copyOf(tmp, m), k)
    }
    override def inputTypes = Seq(ArrayType(LongType))
    override def withNewMutableAggBufferOffset(n: Int): MergeSketches = copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): MergeSketches = copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(newChild: Expression): MergeSketches = copy(child = newChild)
    override def prettyName: String = "kmv_merge"
  }

  /** Aggregate column: sketch of a pre-hashed int64 column. */
  def buildCol(hashes: Column, k: Int = DefaultK): Column =
    ColumnBridge.column(Build(ColumnBridge.expression(hashes), k).toAggregateExpression())

  /** Aggregate column: union of stored sketch columns (array<bigint>). */
  def mergeCol(sketches: Column, k: Int = DefaultK): Column =
    ColumnBridge.column(MergeSketches(ColumnBridge.expression(sketches), k).toAggregateExpression())

  /** Distinct-count estimate from a sketch column (array<bigint>).
    * Exact below k; (k-1)·2^48 / h_(k) at k. */
  def estimate(sketch: Column, k: Int = DefaultK): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(HashSpace) /
        element_at(sketch, k).cast("double"))
}
