package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{MinHashSig, QuantizedDot, QuantizedL2Sq, SimHash48, SortedIntersectCount, StringHashes, SubstringHashes}
import graft.pipeline.Hashing

/** GraftExtensions registers the native expressions as SQL functions via
  * `spark.sql.extensions` (the shared test session boots with it) — each SQL
  * spelling must equal its Column-API twin, and literal-argument validation
  * must fail analysis, not return garbage. */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val mod = Hashing.BaseHashMod

  test("substring_hashes SQL == Column API") {
    val df = Seq("the quick brown fox", "jumps over the lazy dog").toDF("t")
    val viaSql = df.selectExpr(s"substring_hashes(t, 8, ${mod}L) AS h").collect()
    val viaCol = df.select(SubstringHashes(col("t"), 8, mod).as("h")).collect()
    assert(viaSql.map(_.getSeq[Long](0)).toSeq == viaCol.map(_.getSeq[Long](0)).toSeq)
  }

  test("string_hashes SQL == Column API") {
    val df = Seq(Seq("alpha", "beta", "gamma")).toDF("a")
    val viaSql = df.selectExpr(s"string_hashes(a, ${mod}L) AS h").collect()
    val viaCol = df.select(StringHashes(col("a"), mod).as("h")).collect()
    assert(viaSql.map(_.getSeq[Long](0)).toSeq == viaCol.map(_.getSeq[Long](0)).toSeq)
  }

  test("sorted_intersect_count SQL == Column API and counts correctly") {
    val df = Seq((Seq(1L, 3L, 5L, 9L), Seq(3L, 4L, 5L, 10L))).toDF("a", "b")
    val n = df.selectExpr("sorted_intersect_count(a, b) AS n").as[Long].head()
    assert(n == 2L)
    val viaCol = df.select(SortedIntersectCount(col("a"), col("b"))).as[Long].head()
    assert(n == viaCol)
  }

  test("minhash_sig SQL == Column API (full and prefix permutation sets)") {
    val df = Seq(Seq(17L, 123456L, 999L, 31L)).toDF("h")
    val full = df.selectExpr("minhash_sig(h) AS s").collect().head.getSeq[Long](0)
    val fullCol = df.select(
      MinHashSig(col("h"), Hashing.minhashA, Hashing.minhashB, Hashing.P).as("s"))
      .collect().head.getSeq[Long](0)
    assert(full == fullCol && full.length == Hashing.NumHashes)
    val pre = df.selectExpr("minhash_sig(h, 8) AS s").collect().head.getSeq[Long](0)
    assert(pre == full.take(8))
  }

  test("quantized_dot and simhash48 SQL == Column API") {
    val df = Seq((Seq(2L, -3L, 4L), Seq(5L, 7L, -1L))).toDF("a", "b")
    assert(df.selectExpr("quantized_dot(a, b) AS d").as[Long].head() == 2L * 5 - 3 * 7 - 4)
    assert(df.selectExpr("quantized_dot(a, b) AS d").as[Long].head() ==
      df.select(QuantizedDot(col("a"), col("b"))).as[Long].head())
    val hs = Seq(Seq(7L, 7L, 1L)).toDF("h")
    assert(hs.selectExpr("simhash48(h) AS s").as[Long].head() ==
      hs.select(SimHash48(col("h"))).as[Long].head())
  }

  test("quantized_l2sq SQL == Column API and computes Σ(a-b)²") {
    val df = Seq((Seq(2L, -3L, 4L), Seq(5L, 7L, -1L))).toDF("a", "b")
    // (2-5)² + (-3-7)² + (4-(-1))² = 9 + 100 + 25
    assert(df.selectExpr("quantized_l2sq(a, b) AS d").as[Long].head() == 134L)
    assert(df.selectExpr("quantized_l2sq(a, b) AS d").as[Long].head() ==
      df.select(QuantizedL2Sq(col("a"), col("b"))).as[Long].head())
    // zip_with semantics: truncated to the shorter length
    assert(Seq((Seq(1L, 2L, 9L), Seq(4L))).toDF("a", "b")
      .selectExpr("quantized_l2sq(a, b) AS d").as[Long].head() == 9L)
    // array<int> coercion: same guard as its siblings
    assert(spark.sql("SELECT quantized_l2sq(array(2, 3), array(4, 5)) AS d")
      .collect().head.getLong(0) == 8L)
    val e = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT quantized_l2sq(array(1L), 'oops')").collect())
    assert(e.getMessage.toLowerCase.contains("type"))
  }

  test("null array ELEMENTS are skipped, never read as garbage bytes") {
    // dot / l2sq: a null slot on either side contributes zero
    val df = spark.sql(
      "SELECT array(2L, NULL, 4L) AS a, array(5L, 7L, NULL) AS b")
    assert(df.selectExpr("quantized_dot(a, b) AS d").collect().head.getLong(0) == 10L)
    assert(df.selectExpr("quantized_l2sq(a, b) AS d").collect().head.getLong(0) == 9L)
    // sorted_intersect_count: null slots match nothing
    assert(spark.sql(
      "SELECT sorted_intersect_count(array(1L, NULL, 3L), array(NULL, 3L)) AS n")
      .collect().head.getLong(0) == 1L)
    // string_hashes: null strings are absent (shorter output), not hashed
    val sh = spark.sql(
      "SELECT string_hashes(array('alpha', NULL, 'beta'), 1000000L) AS h")
      .collect().head.getSeq[Long](0)
    val shDense = spark.sql(
      "SELECT string_hashes(array('alpha', 'beta'), 1000000L) AS h")
      .collect().head.getSeq[Long](0)
    assert(sh == shDense)
    // minhash_sig: null hashes don't fold undefined bytes into the minima
    val sig = spark.sql("SELECT minhash_sig(array(17L, NULL, 999L), 4) AS s")
      .collect().head.getSeq[Long](0)
    val sigDense = spark.sql("SELECT minhash_sig(array(17L, 999L), 4) AS s")
      .collect().head.getSeq[Long](0)
    assert(sig == sigDense)
    // simhash48: majority denominator counts only non-null elements
    assert(spark.sql("SELECT simhash48(array(7L, NULL, 7L, 1L)) AS s")
      .collect().head.getLong(0) ==
      spark.sql("SELECT simhash48(array(7L, 7L, 1L)) AS s")
        .collect().head.getLong(0))
  }

  test("array<int> arguments coerce to array<bigint> (no silent garbage)") {
    // Pre-fix these read 4-byte elements as 8-byte longs → garbage counts.
    assert(spark.sql("SELECT sorted_intersect_count(array(1, 3), array(3)) AS n")
      .collect().head.getLong(0) == 1L)
    assert(spark.sql("SELECT quantized_dot(array(2, 3), array(4, 5)) AS d")
      .collect().head.getLong(0) == 23L)
    assert(spark.sql("SELECT simhash48(array(7, 7, 1)) AS s").collect().head.getLong(0) ==
      spark.sql("SELECT simhash48(array(7L, 7L, 1L)) AS s").collect().head.getLong(0))
    val viaInt = spark.sql("SELECT minhash_sig(array(17, 999), 4) AS s")
      .collect().head.getSeq[Long](0)
    val viaLong = spark.sql("SELECT minhash_sig(array(17L, 999L), 4) AS s")
      .collect().head.getSeq[Long](0)
    assert(viaInt == viaLong)
  }

  test("wrong argument types fail analysis, not at runtime") {
    val bad = Seq(
      "SELECT sorted_intersect_count('oops', array(1L))",
      "SELECT quantized_dot(array(1L), 42)",
      "SELECT simhash48('nope')",
      "SELECT substring_hashes(array('a'), 3, 1000)",
      "SELECT string_hashes('scalar', 1000)")
    bad.foreach { sql =>
      val e = intercept[org.apache.spark.sql.AnalysisException](spark.sql(sql).collect())
      assert(e.getMessage.toLowerCase.contains("type"), s"$sql: ${e.getMessage}")
    }
  }

  test("out-of-int-range literals error instead of truncating") {
    // 2^32+8 .toInt would silently become 8 / pass the [1,32] check
    intercept[Exception] {
      spark.sql(s"SELECT substring_hashes('abcdefgh', 4294967304, ${mod}L)").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT minhash_sig(array(1L), 4294967304)").collect()
    }
  }

  test("GraftExtensions.register is an idempotent imperative fallback") {
    GraftExtensions.register(spark) // session already has them via extensions
    GraftExtensions.register(spark) // re-register: overwrite, not error
    assert(spark.sql("SELECT sorted_intersect_count(array(1L), array(1L)) AS n")
      .collect().head.getLong(0) == 1L)
  }

  test("non-literal width fails analysis instead of misbehaving") {
    val df = Seq(("abc", 2)).toDF("t", "w")
    val e = intercept[Exception] {
      df.selectExpr(s"substring_hashes(t, w, ${mod}L)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal"))
  }

  test("registered functions run over the documents table end-to-end") {
    val docs = spark.read.parquet(s"${SparkTestSession.SfDir}/documents.parquet")
    val viaSql = docs
      .selectExpr("doc_id", s"minhash_sig(substring_hashes(text, 8, ${mod}L)) AS sig")
      .orderBy("doc_id").limit(5).collect()
    val viaCol = docs
      .select(col("doc_id"),
        MinHashSig(SubstringHashes(col("text"), 8, mod),
          Hashing.minhashA, Hashing.minhashB, Hashing.P).as("sig"))
      .orderBy("doc_id").limit(5).collect()
    assert(viaSql.map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq ==
      viaCol.map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq)
  }
}
