package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.SparkTestSession.SfDir

class BloomDecontamSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("bloom filter has no false negatives over its build set") {
    val hashes = (0L until 5000L).map(h => (h * h + 13) % (1L << 30))
    val df = hashes.toDF("h")
    val bloom = df
      .agg(graft.functions.BloomProbe.aggCol(col("h"), 1L << 16, 1L << 20).as("bf"))
      .head().getAs[Array[Byte]](0)
    val misses = df.where(!graft.functions.BloomProbe.mightContain(bloom, col("h"))).count()
    assert(misses == 0L, "a bloom filter must never reject a member")
  }

  test("p40 equals the bloom-free exact plan (prefilter is invisible)") {
    // the exact twin: identical shape minus the might_contain prefilter
    val docs = spark.read.parquet(s"$SfDir/documents.parquet")
      .withColumn("toks", split(col("text"), " "))
      .where(size(col("toks")) >= 2)
      .withColumn("shingles",
        expr("array_distinct(transform(sequence(1, size(toks) - 1), i -> concat(toks[i-1], ' ', toks[i])))"))
      .withColumn("hashes", array_sort(array_distinct(
        graft.functions.StringHashes(col("shingles"), Hashing.BaseHashMod))))
    val probes = docs.where(col("doc_id") < PipelineOps.BloomProbeDocs)
      .select(explode(col("hashes")).as("h")).distinct()
    val corpus = docs.where(col("doc_id") >= PipelineOps.BloomProbeDocs)
      .select(col("doc_id"), col("source"), size(col("hashes")).cast("long").as("n_grams"),
        explode(col("hashes")).as("h"))
    val exact = corpus.join(probes, "h")
      .groupBy("doc_id", "source", "n_grams").agg(count(lit(1)).as("n_hits"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_hit_docs"),
        sum(when(col("n_hits") * PipelineOps.BloomHighDen >= col("n_grams") * PipelineOps.BloomHighNum, 1L)
          .otherwise(0L)).as("n_high"),
        sum("n_hits").as("sum_hits"),
        sum("n_grams").as("sum_grams"))
      .withColumn("overlap", col("sum_hits").cast("double") / col("sum_grams").cast("double"))
      .orderBy("source")

    val got = PipelineOps.bloomDecontam(spark, SfDir)
    assert(SparkTestSession.rowImage(got) == SparkTestSession.rowImage(exact))
    assert(got.count() > 0, "fixture must produce hits for the test to bite")
  }

  test("the prefilter is really in the corpus-side plan") {
    val plan = PipelineOps.bloomDecontam(spark, SfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      "bloom prefilter must survive planning on the corpus scan side")
  }
}
