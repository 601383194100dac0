package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Hashing
import graft.SparkTestSession.spark

class MinHashSigSpec extends AnyFunSuite {
  import Hashing.{minhashA, minhashB, P, NumHashes}

  private def composable = expr("array(" +
    (0 until NumHashes).map { j =>
      s"array_min(transform(hs, h -> (${minhashA(j)}L * h + ${minhashB(j)}L) % ${P}L))"
    }.mkString(", ") + ")")

  test("native signature equals the composable 32-pass spelling") {
    import spark.implicits._
    val df = Seq(
      Seq(17L, 123456L, 999999937L, 0L),
      Seq(42L),
      (1L to 500L).map(_ * 7919).toSeq
    ).toDF("hs")
    val rows = df
      .withColumn("native", MinHashSig(col("hs"), minhashA, minhashB, P))
      .withColumn("composed", composable)
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2))
    }
  }

  test("interpreted eval matches codegen") {
    import spark.implicits._
    val df = Seq(Seq(5L, 6L, 7L)).toDF("hs")
      .withColumn("sig", MinHashSig(col("hs"), minhashA, minhashB, P))
    val viaCodegen = df.collect().head.getSeq[Long](1)
    val e = MinHashSig(
      org.apache.spark.sql.graft.ColumnBridge.expression(col("hs")), minhashA, minhashB, P)
    val interpreted = e.nullSafeEval(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(5L, 6L, 7L)))
      .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
      .toLongArray().toSeq
    assert(viaCodegen == interpreted)
  }

  test("empty hash array yields Long.MaxValue minima (no elements)") {
    import spark.implicits._
    val df = Seq(Seq.empty[Long]).toDF("hs")
      .withColumn("sig", MinHashSig(col("hs"), minhashA, minhashB, P))
    assert(df.collect().head.getSeq[Long](1).forall(_ == Long.MaxValue))
  }

  test("interpreted eval matches codegen with null slots (both skip, never read)") {
    // the null guard lives in two separate implementations — the Scala
    // kernel and the generated Java — so equality here is a real check
    val viaCodegen = spark.sql("SELECT minhash_sig(array(5L, NULL, 7L)) AS s")
      .collect().head.getSeq[Long](0)
    val e = MinHashSig(
      org.apache.spark.sql.graft.ColumnBridge.expression(col("hs")), minhashA, minhashB, P)
    val interpreted = e.nullSafeEval(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[Any](5L, null, 7L)))
      .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
      .toLongArray().toSeq
    assert(viaCodegen == interpreted)
    val dense = spark.sql("SELECT minhash_sig(array(5L, 7L)) AS s")
      .collect().head.getSeq[Long](0)
    assert(viaCodegen == dense, "null slot contributes nothing")
  }
}

class TextHashesSpec extends AnyFunSuite {
  private val hex12Sql = "CAST(conv(substr(md5(%s), 1, 12), 16, 10) AS BIGINT)"

  test("SubstringHashes equals the composable md5/conv spelling") {
    import spark.implicits._
    val df = Seq("the quick brown fox", "abc", "abcd").toDF("text")
      .withColumn("native", SubstringHashes(col("text"), 3, 0L))
      .withColumn("composed", expr(
        s"transform(sequence(1, length(text) - 2), i -> ${hex12Sql.format("substr(text, i, 3)")})"))
    df.collect().foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), r.getString(0))
    }
  }

  test("SubstringHashes of text shorter than the window is empty (DuckDB range semantics)") {
    import spark.implicits._
    val df = Seq("ab", "").toDF("text")
      .withColumn("native", SubstringHashes(col("text"), 3, 0L))
    df.collect().foreach(r => assert(r.getSeq[Long](1).isEmpty))
  }

  test("SubstringHashes honors the modulus") {
    import spark.implicits._
    val rows = Seq("hello world").toDF("text")
      .withColumn("h", SubstringHashes(col("text"), 8, Hashing.BaseHashMod))
      .collect()
    rows.head.getSeq[Long](1).foreach(h => assert(h >= 0 && h < Hashing.BaseHashMod))
  }

  test("SortedIntersectCount equals array_intersect cardinality on sorted distinct arrays") {
    import spark.implicits._
    val pairs = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 5L, 10L)),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(7L), Seq(7L)),
      (Seq(1L, 2L, 3L), Seq(4L, 5L)),
      ((1L to 500L).toSeq, (250L to 750L).toSeq))
    val df = pairs.toDF("a", "b")
      .withColumn("native", SortedIntersectCount(col("a"), col("b")))
      .withColumn("builtin", expr("CAST(size(array_intersect(a, b)) AS BIGINT)"))
    df.collect().foreach(r => assert(r.getLong(2) == r.getLong(3), r.getSeq[Long](0).take(5)))
    // interpreted eval path (outside codegen) agrees
    val e = SortedIntersectCount(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Seq(1L, 4L, 6L),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Seq(2L, 4L, 6L, 8L),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false)))
    assert(e.eval(null) == 2L)
  }

  test("QuantizedDot equals the aggregate/zip_with spelling on in-range vectors") {
    import spark.implicits._
    // quantization bounds every product/norm far below 2^63 (Hashing
    // QuantScale doc), so overflow never occurs in the operators; note the
    // boundary semantics differ there — ANSI throws, the native kernel wraps
    val df = Seq(
      (Seq(1L, -2L, 3L), Seq(4L, 5L, -6L)),
      (Seq.empty[Long], Seq.empty[Long]),
      ((1L to 64L).toSeq, (1L to 64L).map(_ * 100000L)))
      .toDF("a", "b")
      .withColumn("native", graft.functions.QuantizedDot(col("a"), col("b")))
      .withColumn("composed",
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
    df.collect().foreach(r => assert(r.getLong(2) == r.getLong(3)))
    val e = graft.functions.QuantizedDot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Seq(2L, 3L),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Seq(10L, 10L),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false)))
    assert(e.eval(null) == 50L)
  }

  test("SimHash48 equals the aggregate spelling and handles edge cases") {
    import spark.implicits._
    val df = Seq(
      Seq(0xffffffffffffL, 0xffffffffffffL, 0L),          // majority all-ones
      Seq(1L, 2L, 4L),                                     // no majority bits
      Seq(5L),                                             // single element
      Seq.empty[Long])
      .toDF("hashes")
      .withColumn("native", graft.functions.SimHash48(col("hashes")))
      .withColumn("composed", expr(
        """aggregate(sequence(0, 47), CAST(0 AS BIGINT), (acc, b) ->
          |  acc + IF(2 * aggregate(hashes, CAST(0 AS BIGINT), (a2, h) -> a2 + ((h >> b) & 1)) > size(hashes),
          |         shiftleft(CAST(1 AS BIGINT), b), CAST(0 AS BIGINT)))""".stripMargin))
    df.collect().foreach(r => assert(r.getLong(1) == r.getLong(2)))
    assert(df.where(col("hashes") === array()).select("native").head().getLong(0) == 0L)
  }

  test("StringHashes equals per-element md5Long") {
    import spark.implicits._
    val rows = Seq(Seq("alpha", "beta", "gamma")).toDF("xs")
      .withColumn("h", StringHashes(col("xs"), 0L))
      .collect()
    val got = rows.head.getSeq[Long](1)
    val want = Seq("alpha", "beta", "gamma").map(Hashing.md5Long(_, 12))
    assert(got == want)
  }
}
