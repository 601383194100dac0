package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.sql.Timestamp
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** Degenerate-data sweep over the ENTIRE driver contract
  * (`SparkEntry.queries`) under the ANSI default.
  *
  * DegenerateDataSpec pins the known failure classes (inferred generate
  * filters evaluating window lambdas below explicit guards, zero-denominator
  * ratios, zero-norm cosines) on the ~dozen operators where they were found.
  * This harness asks the stronger question: does EVERY entry — OLAP q's,
  * CDC/streaming chains, ANN maintenance, reporting — complete on a corpus
  * that contains the degenerate rows a 100 TB crawl certainly has? It
  * builds a full star mirroring sf0.001 with injected degenerates:
  *
  *   - an EMPTY document and a SINGLE-TOKEN document (zero 2-token
  *     shingles — the class that surfaced INVALID_ARRAY_INDEX in r17),
  *     each with an id-aligned embedding row;
  *   - a ZERO-NORM embedding vector (cosine denominators go to zero);
  *   - a SINGLE-EVENT user (every lag/session window sees a 1-row
  *     partition) and a zero-value event with an empty JSON props object.
  *
  * Completion is the assertion: a crash here is a job-killing row at
  * scale. Row-level semantics stay covered by the DuckDB oracle gate on
  * the well-formed fixtures and by DegenerateDataSpec's targeted checks.
  *
  * Run: sbt "Test/runMain graft.DegenerateSweep [outDir] [names...]"
  */
object DegenerateSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "true") // the point of the sweep
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "5min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    require(spark.conf.get("spark.sql.ansi.enabled") == "true")

    val dir =
      if (args.nonEmpty) args.head
      else Files.createTempDirectory("graft_degen_star").toString
    val only = args.drop(1).toSet
    buildStar(spark, "/root/testdata/sf0.001", dir)

    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only(n))
    var failed = List.empty[(String, String)]
    names.foreach { n =>
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(n)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        println(f"DEGEN_OK $n ${(System.nanoTime() - t0) / 1e9}%.1fs")
      } catch {
        case e: Throwable =>
          val root = rootCause(e)
          failed ::= (n, s"${root.getClass.getSimpleName}: ${root.getMessage}")
          println(s"DEGEN_FAIL $n ${failed.head._2}")
      }
    }
    println(s"DEGEN_SUMMARY ${names.length - failed.length}/${names.length} ok")
    failed.reverse.foreach { case (n, m) => println(s"DEGEN_FAILED $n $m") }
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }

  private def rootCause(e: Throwable): Throwable =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).reduceLeft((_, c) => c)

  /** sf-layout star at `out`: TPC-H tables copied byte-for-byte,
    * documents/embeddings/events rewritten with the degenerate rows. */
  def buildStar(spark: SparkSession, src: String, out: String): Unit = {
    Files.createDirectories(Paths.get(out))
    val passthrough = Seq("region", "nation", "customer", "supplier",
      "part", "orders", "lineitem")
    passthrough.foreach { t =>
      Files.copy(Paths.get(s"$src/$t.parquet"), Paths.get(s"$out/$t.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val maxDoc = docs.agg(org.apache.spark.sql.functions.max("doc_id"))
      .head.getLong(0)
    val degenDocs = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(maxDoc + 1, "", "en", "lone", 0L),          // empty text
        Row(maxDoc + 2, "x", "en", "src0", 1L)),        // one token
      StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType))))
    docs.unionByName(degenDocs).coalesce(1)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val embs = spark.read.parquet(s"$src/embeddings.parquet")
    val dim = embs.selectExpr("max(size(embedding))").head.getInt(0)
    val degenEmbs = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(maxDoc + 1, Seq.fill(dim)(0.0f), 0),        // zero norm
        Row(maxDoc + 2, Seq.tabulate(dim)(i => (i + 1).toFloat), 1)),
      StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)),
        StructField("label", IntegerType))))
    embs.unionByName(degenEmbs).coalesce(1)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    val events = spark.read.parquet(s"$src/events.parquet")
    val maxEvt = events.agg(org.apache.spark.sql.functions.max("event_id"))
      .head.getLong(0)
    val degenEvents = spark.createDataFrame(
      java.util.Arrays.asList(
        // single-event user: its own 1-row session/lag partition
        Row(maxEvt + 1, Timestamp.valueOf("2024-01-15 12:00:00"), 9901L,
          "view", 0.0, "{}"),
        // zero-value event on an existing-style stream
        Row(maxEvt + 2, Timestamp.valueOf("2024-01-16 12:00:00"), 9902L,
          "view", 0.0, "{}")),
      StructType(Seq(
        StructField("event_id", LongType), StructField("ts", TimestampType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType))))
    events.unionByName(degenEvents).coalesce(1)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
  }
}
