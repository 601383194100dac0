package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native minhash-signature expression: one pass over the element hashes
  * computes all `numHashes` permutation minima,
  * `sig[j] = min_h (a(j)*h + b(j)) mod p`.
  *
  * The composable spelling — `array(array_min(transform(hashes, ...)) * 32)`
  * — walks the array once per permutation (32 traversals per document) and
  * allocates an intermediate array each time. This `UnaryExpression` with
  * `doGenCode` emits a single fused loop inside whole-stage codegen: one
  * traversal, zero allocations, same 64-bit arithmetic as the DuckDB oracle
  * (inputs are < 2^30 so a*h+b stays far below 2^63).
  *
  * This is the (b) tier of the customization ladder — a scalar Catalyst
  * `Expression` — reached because the built-in operator composition
  * genuinely can't express the fused loop.
  */
final case class MinHashSig(
    child: Expression,
    a: Seq[Long],
    b: Seq[Long],
    p: Long) extends UnaryExpression with ImplicitCastInputTypes {

  require(a.length == b.length && a.nonEmpty, "a/b coefficient lists must match")

  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val hashes = input.asInstanceOf[ArrayData]
    val n = a.length
    val sig = Array.fill(n)(Long.MaxValue)
    var i = 0
    val len = hashes.numElements()
    while (i < len) {
      // null slots are absent hashes, not zeros — reading getLong over a
      // null UnsafeArrayData slot would fold undefined bytes into the minima
      if (!hashes.isNullAt(i)) {
        val h = hashes.getLong(i)
        var j = 0
        while (j < n) {
          val v = (a(j) * h + b(j)) % p
          if (v < sig(j)) sig(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aArr = ctx.addReferenceObj("minhashA", a.toArray, "long[]")
    val bArr = ctx.addReferenceObj("minhashB", b.toArray, "long[]")
    val n = a.length
    nullSafeCodeGen(ctx, ev, hashes => {
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |long[] $sig = new long[$n];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |int ${i}_len = $hashes.numElements();
         |for (int $i = 0; $i < ${i}_len; $i++) {
         |  if ($hashes.isNullAt($i)) continue;
         |  long $h = $hashes.getLong($i);
         |  for (int $j = 0; $j < $n; $j++) {
         |    long $v = ($aArr[$j] * $h + $bArr[$j]) % ${p}L;
         |    if ($v < $sig[$j]) $sig[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Column-API entry: signature of all [[graft.pipeline.Hashing]]
    * permutations over an `Array[Long]` column of element hashes. */
  def apply(hashes: Column, a: Seq[Long], b: Seq[Long], p: Long): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(hashes), a, b, p))
}
