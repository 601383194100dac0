package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Integer-vector kernels for the quantized-embedding operators.
  *
  * The composable spelling `aggregate(zip_with(a, b, (x,y) -> x*y), 0, +)`
  * allocates an intermediate array and runs the lambda through
  * non-codegen'd HigherOrderFunction plumbing per ROW — in ANN scoring
  * that's per candidate pair, millions of times. One fused loop over the
  * two long arrays is the shape a native engine would emit. Results are
  * bit-identical (same int64 arithmetic, same wrap semantics).
  *
  * Null ELEMENTS (the array itself being null is handled by
  * `nullIntolerant`) contribute zero: a null slot is skipped rather than
  * read, because `getLong` over a null slot in UnsafeArrayData returns
  * undefined bytes. For simhash the majority denominator counts only
  * non-null elements — a null hash is absent, not a zero vote. */
object VectorKernel {
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0; var acc = 0L
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  /** Σ (a(i)-b(i))² over two int64 vectors (zip_with semantics: truncated
    * to the shorter length). The PQ hot kernel — evaluated per (vector,
    * subspace, centroid) during encoding and per (query, subspace, centroid)
    * when building ADC tables; quantized components are ≤1e5 in magnitude so
    * a 64-dim squared distance stays below 2^46, exact in int64. */
  def l2sq(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0; var acc = 0L
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val d = a.getLong(i) - b.getLong(i); acc += d * d
      }
      i += 1
    }
    acc
  }

  /** 48-bit simhash of a hash multiset: bit b set iff a strict majority of
    * element hashes carry bit b. ONE pass over the array maintaining 48
    * counters — the composable `aggregate(sequence(0,47), ...)` spelling
    * walks the array 48 times through lambda plumbing. */
  def simhash48(hashes: ArrayData): Long = {
    val n = hashes.numElements()
    val cnt = new Array[Int](48)
    var i = 0; var nonNull = 0
    while (i < n) {
      if (!hashes.isNullAt(i)) {
        nonNull += 1
        val h = hashes.getLong(i)
        var b = 0
        while (b < 48) { cnt(b) += ((h >> b) & 1L).toInt; b += 1 }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 48) { if (2 * cnt(b) > nonNull) out |= 1L << b; b += 1 }
    out
  }
}

/** `quantized_dot(a, b)` — Σ a(i)*b(i) over two int64 vectors (zip_with
  * semantics: truncated to the shorter length). */
final case class QuantizedDot(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  // coerce array<int> → array<bigint> at analysis; the kernel reads 8-byte
  // elements and would see garbage over a 4-byte UnsafeArrayData layout
  override def inputTypes =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernel.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorKernel.dot($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedDot =
    copy(left = newLeft, right = newRight)
}

object QuantizedDot {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(QuantizedDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** `quantized_l2sq(a, b)` — Σ (a(i)-b(i))² over two int64 vectors. */
final case class QuantizedL2Sq(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernel.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorKernel.l2sq($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedL2Sq =
    copy(left = newLeft, right = newRight)
}

object QuantizedL2Sq {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(QuantizedL2Sq(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** `simhash48(hashes)` — majority-bit fingerprint of an int64 hash array. */
final case class SimHash48(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    VectorKernel.simhash48(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.VectorKernel.simhash48($arr);")

  override protected def withNewChildInternal(newChild: Expression): SimHash48 =
    copy(child = newChild)
}

object SimHash48 {
  def apply(arr: Column): Column =
    ColumnBridge.column(SimHash48(ColumnBridge.expression(arr)))
}
