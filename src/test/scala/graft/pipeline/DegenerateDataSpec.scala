package graft.pipeline

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.spark
import graft.core._
import graft.plan.AggExprs

/** Degenerate-data robustness under the ANSI default (Spark 4 ships
  * `spark.sql.ansi.enabled=true`, where even DOUBLE x/0 THROWS instead of
  * the legacy NULL): a 100 TB corpus WILL contain empty documents,
  * single-token documents (zero 2-token shingles), and zero-norm
  * embedding vectors. Every data-denominator ratio in the pipeline must
  * yield the DuckDB oracle's NULL for those rows — never an
  * ArithmeticException that kills the whole job. The sf fixtures carry no
  * zeros, so this spec builds its own. */
class DegenerateDataSpec extends AnyFunSuite {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_degen").toString
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val docs = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, "the quick brown fox jumps over the lazy dog", "en", "web", 44L),
        Row(2L, "x", "en", "web", 1L), // single token: zero 2-token shingles
        Row(3L, "", "en", "lone", 0L), // empty text
        Row(4L, "the quick brown fox jumps over the lazy dog", "en", "mirror", 44L)),
      docSchema)
    docs.coalesce(1).write.parquet(s"$d/documents.parquet")
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    def vec(xs: Float*) = xs.toSeq
    val dim = 8
    val embs = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, vec(Seq.tabulate(dim)(i => (i + 1).toFloat): _*), 0),
        Row(2L, vec(Seq.tabulate(dim)(i => (i + 1).toFloat): _*), 0), // dup of 1
        Row(3L, vec(Seq.fill(dim)(0.0f): _*), 1),                     // zero norm
        Row(4L, vec(Seq.tabulate(dim)(i => (dim - i).toFloat): _*), 1)),
      embSchema)
    embs.coalesce(1).write.parquet(s"$d/embeddings.parquet")
    d
  }

  test("text quality/stats ratios survive empty and single-token docs") {
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true",
      "this spec exists to pin behavior under the ANSI default")
    val q = PipelineOps.quality(spark, dir).collect()
    assert(q.nonEmpty)
    val ts = PipelineOps.textStats(spark, dir).collect()
    assert(ts.nonEmpty)
  }

  test("ngram/shingle ops survive docs with zero 2-token shingles") {
    // single-token and empty docs produce zero shingles/spans/windows.
    // Catalyst's inferred generate filter (size(derived) > 0) pushes BELOW
    // the explicit token-count guards and evaluates the derivations on
    // unfiltered rows, so every window expression must be TOTAL — a
    // sequence(1, 0) index lambda is the descending [1, 0] and throws
    // INVALID_ARRAY_INDEX under the ANSI default (caught live by this
    // spec; fixed with slice-based windows)
    PipelineOps.ngramJaccard(spark, dir).collect()
    PipelineOps.sourceOverlap(spark, dir).collect()
    PipelineOps.lmScore(spark, dir).collect()
    PipelineOps.dupSpans(spark, dir).collect()
    PipelineOps.spanScrub(spark, dir).collect()
    PipelineOps.repetition(spark, dir).collect()
    PipelineOps.fingerprints(spark, dir).collect()
    PipelineOps.minhashPairs(spark, dir).collect()
    PipelineOps.simhashPairs(spark, dir).collect()
  }

  test("cosine ops survive a zero-norm embedding: NULL similarity, pair dropped") {
    val brute = PipelineOps.annBrute(spark, dir).collect()
    // the zero vector can never clear a positive cosine threshold; rows
    // that survive must all carry non-null, finite cosines
    PipelineOps.embDedup(spark, dir).collect().foreach { r =>
      val c = r.getAs[Any]("cosine")
      assert(c != null && !c.asInstanceOf[Double].isNaN, s"bad cosine row: $r")
    }
    assert(brute != null)
  }

  test("weighted aggregators yield NULL on zero total weight, not an exception") {
    val df = spark.range(3).select(
      lit(1.0).as("v"), lit(0.0).as("w"), lit("g").as("g"))
    val wavg = Measure("WAvg", "v", Aggregator.WeightedAvg("w"))
    val rows = df.groupBy("g").agg(AggExprs.single(wavg).as("WAvg")).collect()
    assert(rows.length == 1 && rows.head.isNullAt(1),
      s"zero total weight must NULL the weighted average: ${rows.head}")
  }
}
