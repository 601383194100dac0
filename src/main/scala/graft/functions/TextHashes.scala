package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared md5-prefix hashing kernel: first 6 digest bytes big-endian ==
  * `parseLong(md5Hex.take(12), 16)` — the [[graft.pipeline.Hashing]] base
  * hash, computed without hex-string round-trips and with a thread-local
  * reused MessageDigest (the composable `conv(substr(md5(x),1,12),16,10)`
  * spelling allocates a digest + two strings per call, which dominates
  * n-gram pipelines hashing millions of tiny substrings). */
object TextHashKernel {
  private val digests = ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))

  def hash48(bytes: Array[Byte], mod: Long): Long = {
    val d = digests.get()
    d.reset()
    val out = d.digest(bytes)
    val v = ((out(0) & 0xffL) << 40) | ((out(1) & 0xffL) << 32) | ((out(2) & 0xffL) << 24) |
      ((out(3) & 0xffL) << 16) | ((out(4) & 0xffL) << 8) | (out(5) & 0xffL)
    if (mod > 0) v % mod else v
  }

  /** Hashes of every `width`-char substring window (character-based offsets,
    * matching SQL substr; supplementary-plane codepoints count as one char). */
  def substringHashes(text: UTF8String, width: Int, mod: Long): ArrayData = {
    val s = text.toString
    val cps = s.codePointCount(0, s.length)
    val n = cps - width + 1
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n)
    var start = 0 // char index of window start
    var i = 0
    while (i < n) {
      val end = {
        var e = start; var k = 0
        while (k < width) { e += Character.charCount(s.codePointAt(e)); k += 1 }
        e
      }
      out(i) = hash48(s.substring(start, end).getBytes(StandardCharsets.UTF_8), mod)
      start += Character.charCount(s.codePointAt(start))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Element-wise hash of a string array. */
  def stringHashes(arr: ArrayData, mod: Long): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0; var k = 0
    while (i < n) {
      // null elements are dropped (no hash), matching the "nulls are
      // absent, not empty strings" rule shared by all array kernels
      if (!arr.isNullAt(i)) {
        out(k) = hash48(arr.getUTF8String(i).getBytes, mod)
        k += 1
      }
      i += 1
    }
    new GenericArrayData(if (k == n) out else java.util.Arrays.copyOf(out, k))
  }

  /** |A ∩ B| of two ascending-sorted distinct long arrays: one merge walk,
    * no per-call allocation (Spark's `array_intersect` builds a hash set per
    * invocation — per candidate PAIR in a dedup join, which dominates the
    * verify stage). */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements(); val m = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < n && j < m) {
      // null slots can never match anything — skip without reading
      if (a.isNullAt(i)) i += 1
      else if (b.isNullAt(j)) j += 1
      else {
        val x = a.getLong(i); val y = b.getLong(j)
        if (x == y) { c += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
    }
    c
  }
}

/** `substring_hashes(text, width, mod)` — md5-48bit hash of every
  * width-char window of the text, one fused pass. */
final case class SubstringHashes(child: Expression, width: Int, mod: Long)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(width > 0, "width must be positive")

  // SQL-registered path: coerce/validate at analysis time — a non-string
  // child must fail analysis, not ClassCastException at runtime.
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TextHashKernel.substringHashes(input.asInstanceOf[UTF8String], width, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text =>
      s"${ev.value} = graft.functions.TextHashKernel.substringHashes($text, $width, ${mod}L);")

  override protected def withNewChildInternal(newChild: Expression): SubstringHashes =
    copy(child = newChild)
}

/** `string_hashes(arr, mod)` — md5-48bit hash of each array element. */
final case class StringHashes(child: Expression, mod: Long)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TextHashKernel.stringHashes(input.asInstanceOf[ArrayData], mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.TextHashKernel.stringHashes($arr, ${mod}L);")

  override protected def withNewChildInternal(newChild: Expression): StringHashes =
    copy(child = newChild)
}

/** `sorted_intersect_count(a, b)` — intersection cardinality of two
  * ascending-sorted distinct long arrays (callers sort once per document;
  * the join then pays O(m+n) per pair with zero allocation). */
final case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  // array<int> literals coerce to array<bigint>; the kernel reads 8-byte
  // elements, so accepting a 4-byte-element UnsafeArrayData would return
  // garbage counts silently.
  override def inputTypes =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    TextHashKernel.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TextHashKernel.sortedIntersectCount($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SubstringHashes {
  def apply(text: Column, width: Int, mod: Long): Column =
    ColumnBridge.column(SubstringHashes(ColumnBridge.expression(text), width, mod))
}
object StringHashes {
  def apply(arr: Column, mod: Long): Column =
    ColumnBridge.column(StringHashes(ColumnBridge.expression(arr), mod))
}
object SortedIntersectCount {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
