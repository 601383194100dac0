package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.SparkTestSession.SfDir

class KmvSketchSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("insert/union keep the buffer sorted, distinct and k-bounded") {
    val k = 8
    val r = new scala.util.Random(7)
    var buf = Array.emptyLongArray
    val seen = scala.collection.mutable.Set[Long]()
    (1 to 500).foreach { _ =>
      val v = r.nextLong() & 0xffffffffffffL
      seen += v
      buf = KmvSketch.insert(buf, v, k)
      assert(buf.toSeq == buf.toSeq.distinct.sorted)
      assert(buf.length <= k)
    }
    assert(buf.toSeq == seen.toSeq.sorted.take(k), "buffer must be the k smallest distinct")

    val a = Array(1L, 5L, 9L); val b = Array(2L, 5L, 11L)
    assert(KmvSketch.union(a, b, 4).toSeq == Seq(1L, 2L, 5L, 9L))
    assert(KmvSketch.union(a, Array.emptyLongArray, 4).toSeq == a.toSeq)
  }

  private def eventsHashed = {
    graft.sources.EventsSource.read(spark, SfDir) // ts = epoch µs
      .select(col("event_type"), col("ts"),
        expr("CAST(conv(substr(md5(cast(user_id as string)), 1, 12), 16, 10) AS BIGINT)").as("h"))
  }

  test("native aggregator matches the relational KMV (p29) sketch tail") {
    val k = graft.pipeline.PipelineOps.KmvK
    val got = eventsHashed.groupBy("event_type").agg(KmvSketch.buildCol(col("h"), k).as("sk"))
      .select(col("event_type"), size(col("sk")).as("n_kept"), element_at(col("sk"), -1).as("kth"))
      .collect().map(r => r.getString(0) -> ((r.getInt(1).toLong, r.getLong(2)))).toMap

    val rel = graft.pipeline.PipelineOps.kmvDistinct(spark, SfDir)
      .select("event_type", "n_kept", "kth")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == rel)
  }

  test("per-day sketches merged == one sketch over everything (pre-agg path)") {
    val k = 32
    def build(c: org.apache.spark.sql.Column) = KmvSketch.buildCol(c, k)
    def mergeS(c: org.apache.spark.sql.Column) = KmvSketch.mergeCol(c, k)
    val withDay = eventsHashed.withColumn("day", expr("ts DIV 86400000000")) // µs/day

    val perDay = withDay.groupBy("event_type", "day").agg(build(col("h")).as("sk"))
    val merged = perDay.groupBy("event_type").agg(mergeS(col("sk")).as("sk"))
      .collect().map(r => (r.getString(0), r.getSeq[Long](1).toSeq)).toMap
    val direct = withDay.groupBy("event_type").agg(build(col("h")).as("sk"))
      .collect().map(r => (r.getString(0), r.getSeq[Long](1).toSeq)).toMap
    assert(merged == direct,
      "sketch union must be lossless — summaries re-aggregate to the full-range sketch")
  }

  test("random partitionings and two-level rollups are lossless at any k") {
    // the summary-servable claim rests on partition invariance: however
    // rows are carved into partial sketches — and however those partials
    // are themselves rolled up — the merged sketch must equal the direct
    // one. Day-based splits (above) are one carving; this fuzzes random
    // carvings at several k, plus a two-level rollup (part -> super -> all,
    // the preagg hierarchy path).
    val rng = new scala.util.Random(0xD1CE)
    for (k <- Seq(8, 64); trial <- 1 to 2) {
      val nParts = 2 + rng.nextInt(30)
      val seed = rng.nextInt(1 << 20)
      val parted = eventsHashed
        .withColumn("part", expr(s"pmod(CAST(conv(substr(md5(concat(cast(h as string), '$seed')), 1, 8), 16, 10) AS BIGINT), $nParts)"))
      val direct = parted.groupBy("event_type")
        .agg(KmvSketch.buildCol(col("h"), k).as("sk"))
        .collect().map(r => (r.getString(0), r.getSeq[Long](1).toSeq)).toMap

      val partials = parted.groupBy("event_type", "part")
        .agg(KmvSketch.buildCol(col("h"), k).as("sk"))
      val oneLevel = partials.groupBy("event_type")
        .agg(KmvSketch.mergeCol(col("sk"), k).as("sk"))
        .collect().map(r => (r.getString(0), r.getSeq[Long](1).toSeq)).toMap
      val twoLevel = partials
        .withColumn("sup", col("part") % 3)
        .groupBy("event_type", "sup").agg(KmvSketch.mergeCol(col("sk"), k).as("sk"))
        .groupBy("event_type").agg(KmvSketch.mergeCol(col("sk"), k).as("sk"))
        .collect().map(r => (r.getString(0), r.getSeq[Long](1).toSeq)).toMap

      assert(oneLevel == direct, s"k=$k nParts=$nParts seed=$seed: merge lost information")
      assert(twoLevel == direct, s"k=$k nParts=$nParts seed=$seed: rollup-of-rollups lost information")
    }
  }

  test("estimate is exact below k and within KMV error bounds at k") {
    val k = 64
    def build(c: org.apache.spark.sql.Column) = KmvSketch.buildCol(c, k)
    // small group: fewer than k distinct values -> exact
    val small = Seq.tabulate(40)(i => ("g", (i % 17).toLong)).toDF("g", "v")
      .withColumn("h", expr("CAST(conv(substr(md5(cast(v as string)), 1, 12), 16, 10) AS BIGINT)"))
      .groupBy("g").agg(build(col("h")).as("sk"))
      .select(KmvSketch.estimate(col("sk"), k)).head().getDouble(0)
    assert(small == 17.0)

    // large group: n = 5000 uniform hashes, rel error ~ 1/sqrt(k-2) = 12.7%;
    // assert a 4-sigma bound (deterministic data -> deterministic estimate,
    // the bound just documents the accuracy class)
    val n = 5000
    val big = Seq.tabulate(n)(i => ("g", i.toLong)).toDF("g", "v")
      .withColumn("h", expr("CAST(conv(substr(md5(cast(v as string)), 1, 12), 16, 10) AS BIGINT)"))
      .groupBy("g").agg(build(col("h")).as("sk"))
      .select(KmvSketch.estimate(col("sk"), k)).head().getDouble(0)
    assert(math.abs(big - n) / n < 4.0 / math.sqrt(k - 2.0), s"estimate $big for n=$n")
  }
}
