package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.{spark, SfDir}

class HashingSpec extends AnyFunSuite {

  test("hex63 matches the md5-derived expected value (cross-engine constants)") {
    // expected values computed independently from the md5 hex digest:
    // (first_char % 8) * 2^60 + int64(chars 2..16); the DuckDB twin in
    // PipelineOracles was validated against the same constants
    val cases = Seq(
      "hello"               -> 6719722671305337462L,
      "the quick brown fox" -> 3527384202465209835L,
      "a b c d e"           -> 2610038962114407229L)
    import spark.implicits._
    cases.foreach { case (s, exp) =>
      val got = Seq(s).toDF("x").selectExpr(PipelineOps.hex63("x")).head().getLong(0)
      assert(got == exp, s"hex63('$s')")
    }
  }

  test("md5Long matches known md5 prefixes") {
    // md5("hello") = 5d41402abc4b2a76b9719d911017c592
    assert(Hashing.md5Long("hello", 12) == java.lang.Long.parseLong("5d41402abc4b", 16))
    assert(Hashing.md5Long("hello", 8) == java.lang.Long.parseLong("5d41402a", 16))
  }

  test("minhash permutation constants are in-range and odd a") {
    assert(Hashing.minhashA.length == Hashing.NumHashes)
    assert(Hashing.minhashB.length == Hashing.NumHashes)
    Hashing.minhashA.foreach { a =>
      assert(a > 0 && a < Hashing.BaseHashMod)
      assert(a % 2 == 1, "a must be odd (invertible mod 2^k)")
    }
    Hashing.minhashB.foreach(b => assert(b >= 0 && b < Hashing.BaseHashMod))
    assert(Hashing.NumHashes == Hashing.Bands * Hashing.RowsPerBand)
  }

  test("plane weights deterministic and bounded") {
    val w = Hashing.planeWeight(3, 17)
    assert(w == Hashing.planeWeight(3, 17))
    for (p <- 0 until Hashing.LshPlanes; d <- 0 until Hashing.EmbDim) {
      val x = Hashing.planeWeight(p, d)
      assert(x >= -1000 && x <= 1000)
    }
  }
}

class PipelineOpsSpec extends AnyFunSuite {

  test("text stats cover every language with exact totals") {
    val rows = PipelineOps.textStats(spark, SfDir).collect()
    assert(rows.map(_.getString(0)).toSeq == rows.map(_.getString(0)).toSeq.sorted)
    val total = rows.map(_.getLong(1)).sum
    val nDocs = spark.read.parquet(s"$SfDir/documents.parquet").count()
    assert(total == nDocs)
  }

  test("exact dedup never keeps more than total docs") {
    val rows = PipelineOps.exactDedup(spark, SfDir).collect()
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "n_kept <= n_docs")
      assert(r.getLong(3) >= 0)
    }
  }

  test("minhash pairs are ordered, above threshold, and self-free") {
    val rows = PipelineOps.minhashPairs(spark, SfDir).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.5 && r.getDouble(2) <= 1.0)
    }
  }

  test("ann brute: 5 ranked neighbors per query, cosine within [-1,1] and non-increasing") {
    val rows = PipelineOps.annBrute(spark, SfDir).collect()
    val perQuery = rows.groupBy(_.getLong(0))
    assert(perQuery.size == 10)
    perQuery.values.foreach { rs =>
      assert(rs.length == 5)
      val ordered = rs.sortBy(_.getLong(1))
      assert(ordered.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
      val cosines = ordered.map(_.getDouble(3))
      assert(cosines.forall(c => c >= -1.0001 && c <= 1.0001))
      assert(cosines.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
      assert(ordered.forall(_.getLong(2) != ordered.head.getLong(0)), "self excluded")
    }
  }

  test("ann lsh candidates share the query's bucket and appear in brute results order") {
    val rows = PipelineOps.annLsh(spark, SfDir).collect()
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      assert(rs.map(_.getLong(3)).distinct.length == 1, "one bucket per query")
      assert(rs.length <= 3)
    }
  }

  test("ann ivf returns ranked probe-list neighbors consistent with brute force on shared candidates") {
    val ivf = PipelineOps.annIvf(spark, SfDir).collect()
    val brute = PipelineOps.annBrute(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(ivf.nonEmpty)
    ivf.groupBy(_.getLong(0)).values.foreach(rs => assert(rs.length <= 3))
    // any (query, neighbor) IVF shares with brute-force top-5 must carry the
    // identical cosine (same quantized arithmetic)
    ivf.foreach { r =>
      brute.get((r.getLong(0), r.getLong(2))).foreach { c =>
        assert(c == r.getDouble(3))
      }
    }
  }

  test("langid confusion counts cover all docs") {
    val rows = PipelineOps.langId(spark, SfDir).collect()
    val total = rows.map(_.getLong(2)).sum
    assert(total == spark.read.parquet(s"$SfDir/documents.parquet").count())
    val preds = rows.map(_.getString(1)).toSet
    assert(preds.subsetOf(Set("de", "en", "es", "fr", "zh", "und")))
  }

  test("simhash fingerprints bounded by doc count") {
    val rows = PipelineOps.simhash(spark, SfDir).collect()
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
  }

  test("dedup verdict: one row per doc, canonicals are kept, ids never increase") {
    val rows = PipelineOps.dedupVerdict(spark, SfDir).collect()
    val total = PipelineOps.exactDedup(spark, SfDir).collect().map(_.getLong(1)).sum
    assert(rows.length == total, "exactly one verdict per document")
    val byId = rows.map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    rows.foreach { r =>
      val (id, reason, canon) = (r.getLong(0), r.getString(1), r.getLong(2))
      assert(canon <= id, "canonical is always the lowest id")
      if (reason == "kept") assert(canon == id)
      else {
        assert(canon < id, s"dropped doc $id must point elsewhere")
        assert(byId(canon)._1 == "kept", s"canonical $canon of $id must itself be kept")
      }
    }
  }

  test("simhash pairs: hamming bound holds and a shared bit-block exists") {
    val rows = PipelineOps.simhashPairs(spark, SfDir).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "ordered, self-free")
      assert(r.getLong(2) <= PipelineOps.SimhashMaxHamming)
    }
    // pigeonhole invariant of the banding: hamming <= 3 over 4 disjoint
    // 12-bit blocks forces at least one exactly-equal block — every
    // verified pair must have been reachable through some bucket
    rows.foreach { r =>
      assert(r.getLong(2) < PipelineOps.SimhashBlocks,
        "a pair with hamming >= block count could have no shared block")
    }
  }

  test("ngram jaccard pairs ordered and above threshold") {
    val rows = PipelineOps.ngramJaccard(spark, SfDir).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.6 && r.getDouble(2) <= 1.0)
    }
  }

  test("multimodal decode rollup: every doc decodes, modalities partition the corpus") {
    val rows = PipelineOps.multimodal(spark, SfDir).collect()
    val total = rows.map(_.getLong(1)).sum
    assert(total == spark.read.parquet(s"$SfDir/documents.parquet").count())
    rows.foreach { r =>
      assert(r.getLong(2) > 0, "sum_bytes")
      // every asset decoded under exactly one modality — a decode failure
      // (NULL stats) would break this partition
      assert(r.getLong(3) + r.getLong(8) == r.getLong(1), "n_images + n_audio = n_assets")
      // the PNG/BMP split: every other image is a PNG (doc_id % 4 over the
      // % 2 image half); a small source may land zero PNGs
      assert(r.getLong(4) <= r.getLong(3), "n_png <= n_images")
      // decoded dims: w in [1,12], h in [1,9] so pixels per image in [1,108]
      assert(r.getLong(5) >= r.getLong(3) && r.getLong(5) <= r.getLong(3) * 108, "sum_pixels")
      // decoded sample counts: n in [64,163]
      assert(r.getLong(9) >= r.getLong(8) * 64 && r.getLong(9) <= r.getLong(8) * 163, "sum_samples")
      assert(r.getLong(12) <= 32768, "max_abs bounded by 16-bit PCM range")
    }
    // corpus-wide the PNG mix is real: some (not all) images are PNGs
    val (png, img) = (rows.map(_.getLong(4)).sum, rows.map(_.getLong(3)).sum)
    assert(png > 0 && png < img, s"png mix should be a strict subset: $png of $img")
  }

  test("session histogram accounts for every event") {
    val rows = PipelineOps.sessions(spark, SfDir).collect()
    val events = spark.read.parquet(s"$SfDir/events.parquet").count()
    val accounted = rows.map(r => r.getLong(0) * r.getLong(1)).sum
    assert(accounted == events, "n_events * n_sessions must sum to the event count")
  }

  test("lm score matches a hand-computed bigram model on a fixture") {
    import spark.implicits._
    val S = PipelineOps.LmScale
    // corpus grams: A = xy,yx,xy,yx ; B = xy,yz
    // C(x,·)=3 all xy → p(xy)=S; C(y,·)=3: yx×2, yz×1 → p(yx)=2S DIV 3, p(yz)=S DIV 3
    val docs = Seq(
      (1L, "sA", "x y x y x"),
      (2L, "sB", "x y z"),
      (3L, "sC", "solo")) // <2 tokens: excluded entirely
      .toDF("doc_id", "source", "text")
    val rows = PipelineOps.lmScoreOf(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val pyx = 2 * S / 3; val pyz = S / 3
    assert(rows("sA") == ((1L, 4L, 2 * S + 2 * pyx, 0L)))
    assert(rows("sB") == ((1L, 2L, S + pyz, 0L)))
    assert(!rows.contains("sC"), "a source with only sub-bigram docs produces no row")
  }

  test("lm score invariants on the real corpus: bounds, doc accounting, low-tail") {
    val rows = PipelineOps.lmScore(spark, SfDir).collect()
    assert(rows.nonEmpty)
    val eligible = spark.read.parquet(s"$SfDir/documents.parquet")
      .where(org.apache.spark.sql.functions.expr("size(split(text, ' ')) >= 2")).count()
    assert(rows.map(_.getLong(1)).sum == eligible, "every >=2-token doc scored once")
    rows.foreach { r =>
      // per-instance p_scaled <= LmScale, so the corpus mean is a probability
      assert(r.getLong(3) <= r.getLong(2) * PipelineOps.LmScale, "sum_score bound")
      assert(r.getLong(4) <= r.getLong(1), "n_low <= n_docs")
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0, "avg_p in (0,1]")
    }
  }

  test("quantiles: bin-then-refine equals hand-computed rank selection") {
    import spark.implicits._
    val vals = (
      (1 to 10).map(i => ("sA", i * 10L)) ++   // deciles: value = 10·d
      Seq(("sB", 7L)) ++                       // n=1: every decile is the row
      Seq(("sC", 5L), ("sC", 5L), ("sC", 5L))  // degenerate hi==lo extent
    ).toDF("source", "v")
    val rows = PipelineOps.quantilesOf(vals).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    (1 to 9).foreach { d =>
      assert(rows(("sA", d.toLong)) == 10L * d, s"sA d$d")
      assert(rows(("sB", d.toLong)) == 7L, s"sB d$d")
      assert(rows(("sC", d.toLong)) == 5L, s"sC d$d")
    }
    assert(rows.size == 27)
  }

  test("quantiles on the real corpus: monotone per source, rank-exact vs full sort") {
    val got = PipelineOps.quantiles(spark, SfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    // deciles are non-decreasing within each source
    got.groupBy(_._1).foreach { case (_, rs) =>
      val vs = rs.sortBy(_._2).map(_._4)
      assert(vs.zip(vs.tail).forall { case (a, b) => a <= b })
    }
    // every decile equals the value at rank ceil(d*n/10) of the full sort
    val bySource = spark.read.parquet(s"$SfDir/documents.parquet")
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    got.foreach { case (s, d, n, v) =>
      val sorted = bySource(s)
      assert(n == sorted.length)
      assert(v == sorted(((d * n + 9) / 10).toInt - 1), s"$s d$d")
    }
  }

  test("hash split partitions every doc exactly once, deterministically") {
    val rows = PipelineOps.hashSplit(spark, SfDir).collect()
    val splits = rows.map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "valid", "test")))
    val total = rows.map(_.getLong(1)).sum
    assert(total == spark.read.parquet(s"$SfDir/documents.parquet").count())
    // deterministic: a re-run assigns identically
    val again = PipelineOps.hashSplit(spark, SfDir).collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      again.map(r => (r.getString(0), r.getLong(1))).toSeq)
    // the 80/10/10 buckets should put the bulk in train
    val train = rows.find(_.getString(0) == "train").map(_.getLong(1)).getOrElse(0L)
    assert(train * 2 > total, "train majority")
  }

  test("contamination flags exclude probe docs and respect the ratio bound") {
    val rows = PipelineOps.contamination(spark, SfDir).collect()
    assert(rows.nonEmpty, "fixture threshold must flag at least one doc")
    rows.foreach { r =>
      assert(r.getLong(0) >= PipelineOps.ContaminationProbeDocs, "probe docs excluded")
      assert(r.getLong(1) <= r.getLong(2), "hits <= grams")
      val minRatio = PipelineOps.ContaminationNum.toDouble / PipelineOps.ContaminationDen
      assert(r.getDouble(3) >= minRatio && r.getDouble(3) <= 1.0)
    }
  }

  test("repetition ratios within [0,1], dup counts bounded by totals") {
    val rows = PipelineOps.repetition(spark, SfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), "dup_toks <= sum_toks")
      assert(r.getLong(5) <= r.getLong(4), "dup_grams <= sum_grams")
      assert(r.getLong(6) <= r.getLong(1), "n_flagged <= n_docs")
      assert(r.getDouble(7) >= 0.0 && r.getDouble(7) <= 1.0)
      assert(r.getDouble(8) >= 0.0 && r.getDouble(8) <= 1.0)
    }
  }

  test("rare-token ratios within [0,1] and counts consistent") {
    val rows = PipelineOps.rareTokens(spark, SfDir).collect()
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "n_rare <= n_tokens")
      assert(r.getLong(3) <= r.getLong(2) || r.getLong(2) == 0, "types <= occurrences")
      val ratio = r.getDouble(4)
      assert(ratio >= 0.0 && ratio <= 1.0)
    }
  }

  test("packing windows hold exactly the shard's tokens") {
    val rows = PipelineOps.packing(spark, SfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, sumToks, nWin, nSplit, maxToks, fill) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))
      assert(nWin == (sumToks + PipelineOps.CtxLen - 1) / PipelineOps.CtxLen)
      assert(nSplit <= nDocs)
      // a doc can cross at most ceil(len/C) boundaries; with fixture docs
      // far under CtxLen each crosses at most one
      assert(maxToks < PipelineOps.CtxLen, "fixture docs fit one window")
      assert(fill > 0.0 && fill <= 1.0)
      // every window except possibly the last is full: fill >= (nWin-1)/nWin
      assert(fill * nWin >= nWin - 1.0)
    }
  }

  test("mixture keeps within target rate bounds, deterministically") {
    val rows = PipelineOps.mixture(spark, SfDir).collect()
    rows.foreach { r =>
      val (rate, nDocs, nKept) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(rate >= PipelineOps.MixBase &&
        rate < PipelineOps.MixBase + PipelineOps.MixStep * PipelineOps.MixMod)
      assert(nKept <= nDocs)
    }
    val again = PipelineOps.mixture(spark, SfDir).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("connected components labels a path graph and separates islands (both paths)") {
    import spark.implicits._
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L)
    // default threshold = driver union-find tail; 0 = distributed contraction
    for (threshold <- Seq(1L << 17, 0L)) {
      val labels = PipelineOps.connectedComponents(edges, threshold).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(labels == want, s"threshold=$threshold")
    }
  }

  test("connected components matches union-find on adversarial graph shapes") {
    import spark.implicits._
    // long chain (the shape min-label propagation pays O(n) rounds for),
    // a clique, a binary tree, and deterministic pseudo-random edges
    val chain = (1L until 40L).map(i => (i, i + 1))
    val clique = for (i <- 100L to 107L; j <- (i + 1) to 107L) yield (i, j)
    val tree = (2L to 31L).map(i => (i / 2 + 200, i + 200))
    val rand = (0 until 60).map { k =>
      val h1 = Hashing.md5Long(s"cc-a-$k", 12); val h2 = Hashing.md5Long(s"cc-b-$k", 12)
      (300L + (h1 % 50 + 50) % 50, 300L + (h2 % 50 + 50) % 50)
    }.filter { case (x, y) => x != y }
    val edges = chain ++ clique ++ tree ++ rand

    // driver-side union-find oracle
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (x, y) =>
      val (rx, ry) = (find(x), find(y))
      if (rx != ry) parent(math.max(rx, ry)) = math.min(rx, ry)
    }
    val want = parent.keys.map(n => n -> find(n)).toMap

    // both the driver union-find tail and the distributed star contraction
    // must match the oracle (threshold 0 forces the distributed path on
    // this small fixture)
    for (threshold <- Seq(1L << 17, 0L)) {
      val got = PipelineOps.connectedComponents(edges.toDF("a", "b"), threshold)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"threshold=$threshold")
    }

    // reliable-checkpoint mode (GRAFT_CHECKPOINT_DIR → DFS checkpoint(),
    // SURVEY §8.6): same labels as the default localCheckpoint mode, and
    // the checkpoint dir actually received the round snapshots
    val ckDir = java.nio.file.Files.createTempDirectory("graft-ck").toFile
    try {
      PipelineOps.checkpointDirOverride = Some(ckDir.getAbsolutePath)
      val got = PipelineOps.connectedComponents(edges.toDF("a", "b"), 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, "reliable-checkpoint mode")
      def countFiles(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(countFiles).sum else 1
      assert(countFiles(ckDir) > 0, "rounds were checkpointed to the DFS dir")
    } finally {
      PipelineOps.checkpointDirOverride = None
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(ckDir)
    }
  }

  test("dup clusters partition the paired docs, min id leads each cluster") {
    val pairs = PipelineOps.ngramJaccard(spark, SfDir).collect()
    val paired = pairs.flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    val clusters = PipelineOps.dupClusters(spark, SfDir).collect()
    assert(clusters.map(_.getLong(1)).sum == paired.size, "every paired doc in exactly one cluster")
    clusters.foreach { r =>
      assert(r.getLong(1) >= 2, "clusters have >= 2 members")
      assert(r.getLong(0) < r.getLong(2), "cluster id is the min member, max_doc above it")
    }
  }

  test("kmeans step conserves vectors and assigns from broadcast centroids") {
    val df = PipelineOps.kmeansStep(spark, SfDir)
    val rows = df.collect()
    val corpus = spark.read.parquet(s"$SfDir/embeddings.parquet").count()
    assert(rows.map(_.getLong(1)).sum == corpus, "n_before partitions the corpus")
    assert(rows.map(_.getLong(2)).sum == corpus, "n_after partitions the corpus")
    rows.foreach(r => assert(r.getLong(3) <= r.getLong(1), "moved-out bounded by cluster size"))
    // assignment must run against broadcast centroids — the corpus never
    // shuffles to meet them
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), "centroid assignment should broadcast")
  }

  test("dup spans repeat at least twice, ranked by frequency") {
    val rows = PipelineOps.dupSpans(spark, SfDir).collect()
    assert(rows.nonEmpty && rows.length <= PipelineOps.SpanTopK)
    rows.foreach { r =>
      assert(r.getString(0).split(" ").length == PipelineOps.SpanLen)
      assert(r.getLong(1) >= 2, "reported spans occur >= 2 times")
      assert(r.getLong(2) <= r.getLong(1), "distinct docs bounded by occurrences")
    }
    val freqs = rows.map(_.getLong(1))
    assert(freqs.sameElements(freqs.sorted(Ordering[Long].reverse)))
  }

  test("tfidf ranks top-k terms per doc with consistent tf/df") {
    val rows = PipelineOps.tfidf(spark, SfDir).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (_, rs) =>
      assert(rs.length <= PipelineOps.TfIdfTopK)
      assert(rs.map(_.getLong(1)).sorted.sameElements(1L to rs.length))
      // scores non-increasing down the ranks
      val scores = rs.sortBy(_.getLong(1)).map(_.getLong(5))
      assert(scores.sameElements(scores.sorted(Ordering[Long].reverse)))
    }
    rows.foreach { r =>
      assert(r.getLong(0) < PipelineOps.TfIdfDocs)
      assert(r.getLong(3) >= 1 && r.getLong(4) >= 1, "tf and df positive")
    }
  }

  test("stratified sample hits the exact ceil quota in every stratum") {
    val rows = PipelineOps.stratifiedSample(spark, SfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, sample) = (r.getLong(2), r.getLong(3))
      assert(sample == (n * PipelineOps.StratRatePct + 99) / 100,
        s"stratum ${r.getString(0)}/${r.getString(1)} quota exact")
    }
    val again = PipelineOps.stratifiedSample(spark, SfDir).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq, "deterministic")
  }

  test("pq ann: ranked ADC neighbors, distances non-decreasing, self-free") {
    val df = PipelineOps.annPq(spark, SfDir)
    val rows = df.collect()
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.keySet.forall(_ < 10))
    byQuery.foreach { case (qid, rs) =>
      assert(rs.length == PipelineOps.PqTopK)
      assert(rs.forall(_.getLong(2) != qid), "self excluded")
      val dists = rs.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(dists.sameElements(dists.sorted), "ADC distance ascends with rank")
      assert(dists.forall(_ >= 0L))
    }
    // the ADC table must broadcast — a corpus-sized shuffle to meet a
    // queries×M×K table would be the wrong plan at any scale
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), "ADC lookup should broadcast")
  }

  test("funnel stages partition viewers, lags non-negative") {
    val rows = PipelineOps.funnel(spark, SfDir).collect()
    assert(rows.nonEmpty && rows.forall(r => Set(1L, 2L, 3L)(r.getLong(0))))
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getLong(2) >= 0 && r.getLong(3) >= 0, "at-or-after joins: lags >= 0")
      if (r.getLong(0) == 1L) assert(r.getLong(2) == 0 && r.getLong(3) == 0)
      if (r.getLong(0) == 2L) assert(r.getLong(3) == 0)
    }
  }

  test("funnel: every stage branch exercised (users stopping at each stage)") {
    // the sf fixture collapses to one stage row, so ordering violations and
    // partial-funnel lag zeroing need a purpose-built event set
    import spark.implicits._
    val e = Seq(
      (1L, "view", 100L),                                              // stops at view
      (2L, "view", 100L), (2L, "click", 150L),                         // stops at click
      (3L, "view", 100L), (3L, "click", 120L), (3L, "purchase", 200L), // full funnel
      (4L, "click", 50L), (4L, "view", 100L),                          // click BEFORE view: not a stage-2 user
      (5L, "view", 100L), (5L, "click", 150L), (5L, "purchase", 140L)  // purchase before click: stays stage 2
    ).toDF("user_id", "event_type", "tsu")
    val byStage = PipelineOps.funnelStages(e).collect().map(r => r.getLong(0) -> r).toMap
    assert(byStage.keySet == Set(1L, 2L, 3L), "all three stages populated")
    val s1 = byStage(1L)
    assert(s1.getLong(1) == 2 && s1.getLong(2) == 0 && s1.getLong(3) == 0,
      "users 1 and 4 stop at view with zeroed lags")
    val s2 = byStage(2L)
    assert(s2.getLong(1) == 2 && s2.getLong(2) == 100 && s2.getLong(3) == 0,
      "users 2 and 5 stop at click (v2c 50 each); c2p zeroed")
    val s3 = byStage(3L)
    assert(s3.getLong(1) == 1 && s3.getLong(2) == 20 && s3.getLong(3) == 80,
      "user 3 completes: v2c 20, c2p 80")
  }

  test("semdedup verdict partitions vectors; drops name a smaller kept-or-dropped peer") {
    val rows = PipelineOps.semDedup(spark, SfDir).collect()
    val nVec = spark.read.parquet(s"$SfDir/embeddings.parquet").count()
    assert(rows.length == nVec, "one verdict row per vector")
    rows.foreach { r =>
      val vecId = r.getLong(0)
      val kept = r.getLong(3)
      if (kept == 1) assert(r.isNullAt(2), "kept rows carry no dup_of")
      else {
        assert(!r.isNullAt(2) && r.getLong(2) < vecId,
          "a dropped vector names a strictly smaller duplicate-of id")
        assert(!r.isNullAt(1), "only in-cell vectors can be dropped")
      }
    }
    // dup_of targets share the dropped vector's cell
    val cellOf = rows.filter(!_.isNullAt(1)).map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.filter(r => r.getLong(3) == 0).foreach { r =>
      assert(cellOf(r.getLong(2)) == r.getLong(1), "dup edge stays within one cell")
    }
  }

  test("scrub counts and redaction audit are consistent per source") {
    val rows = PipelineOps.scrub(spark, SfDir).collect()
    assert(rows.nonEmpty)
    val nDocs = rows.map(_.getLong(1)).sum
    assert(nDocs == spark.read.parquet(s"$SfDir/documents.parquet").count())
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "flagged is a subset of docs")
      (3 to 5).foreach(i => assert(r.getLong(i) >= 0, "hit counts are non-negative"))
      val audit = r.getLong(6)
      assert(audit >= 0 && audit < r.getLong(1) * PipelineOps.ScrubAuditMod,
        "audit sum stays inside the per-doc modulus bound")
    }
    assert(rows.map(_.getLong(3)).sum > 0, "the lexicon pattern actually fires")
  }

  test("scrub fixture: exact hit counts, flagging, and the zero-hit pattern path") {
    // purpose-built docs: pattern hits are known exactly, including a
    // pattern ('digits') that never fires — the zero path pinned here
    // instead of on a corpus-content assumption
    import spark.implicits._
    val fixture = Seq(
      // customer x3 -> flagged (>= ScrubFlagHits); customers does NOT match (\b)
      ("a", "customer customer customer customers"),
      ("a", "a vector walks into a bar"),
      ("b", "no lexicon words here at all"),
      ("b", "vector vector")
    ).toDF("source", "text")
    val rows = PipelineOps.scrubDocs(fixture).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a", "b"))
    val a = rows(0); val b = rows(1)
    assert(a.getLong(1) == 2 && b.getLong(1) == 2, "n_docs")
    assert(a.getLong(2) == 1 && b.getLong(2) == 0, "only the 3-hit doc is flagged")
    assert(a.getLong(3) == 3 && b.getLong(3) == 0, "customer hits")
    assert(a.getLong(4) == 1 && b.getLong(4) == 2, "vector hits")
    assert(a.getLong(5) == 0 && b.getLong(5) == 0, "digits pattern never fires here")
    // the audit hashes the REDACTED text: recompute b's expected audit by
    // hand-applying the only firing pattern ([VECTOR]) and hashing
    val redactedB = fixture.where($"source" === "b")
      .selectExpr("regexp_replace(text, '\\\\bvector\\\\b', '[VECTOR]') AS r")
      .selectExpr(s"sum(${PipelineOps.hex12("r")} % ${PipelineOps.ScrubAuditMod})")
      .head().getLong(0)
    assert(b.getLong(6) == redactedB, "audit equals the hash of the redacted text")
  }

  test("p60: table-served verdict is row-identical to recomputing p36") {
    def img(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(img(PipelineOps.dedupVerdictServed(spark, SfDir)) ==
      img(PipelineOps.dedupVerdict(spark, SfDir)),
      "the materialized verdict must equal the from-scratch computation")
  }

  test("safe split: partitions the corpus and never splits a dup cluster") {
    import org.apache.spark.sql.functions._
    val rows = PipelineOps.safeSplit(spark, SfDir).collect()
    val total = rows.map(_.getLong(1)).sum
    assert(total == spark.read.parquet(s"$SfDir/documents.parquet").count())
    // THE invariant this operator exists for: every dedup cluster lands in
    // exactly one split — recomputed from the verdict, not from the report
    val v = PipelineOps.dedupVerdict(spark, SfDir)
      .withColumn("cb", expr(s"${PipelineOps.hex12("CAST(canonical_id AS STRING)")} % 100"))
      .withColumn("split",
        when(col("cb") < 80, "train").when(col("cb") < 90, "valid").otherwise("test"))
    val splitsPerCluster = v.groupBy("canonical_id")
      .agg(countDistinct(col("split")).as("ns"))
      .agg(max(col("ns"))).head().getLong(0)
    assert(splitsPerCluster == 1L, "a duplicate family must ride one hash draw")
    // the correction is real on this corpus: someone moved
    assert(rows.map(_.getLong(4)).sum > 0, "n_moved should be nonzero with dups present")
  }

  test("mixture plan: allocations respect the budget and per-source mass") {
    val rows = PipelineOps.mixturePlan(spark, SfDir).collect()
    val kept = rows.map(_.getLong(1)).sum
    val budget = kept / 2
    rows.foreach { r =>
      assert(r.getLong(4) >= 0 && r.getLong(4) <= 100, "rate_pct in [0,100]")
      assert(r.getLong(5) <= r.getLong(1), "planned cannot exceed surviving mass")
      assert(r.getLong(3) >= 0, "target non-negative")
    }
    assert(rows.map(_.getLong(3)).sum <= budget, "sum of floored targets within budget")
    // flooring slack only: targets get within n_sources of the budget
    assert(rows.map(_.getLong(3)).sum >= budget - rows.length,
      "allocation should exhaust the budget up to flooring")
    // reconciles with p51's surviving-token column
    val p51kept = PipelineOps.dedupBudget(spark, SfDir).collect().map(_.getLong(4)).sum
    assert(kept == p51kept)
  }

  test("scrub closure: propagation only adds flags, partitions the corpus") {
    val rows = PipelineOps.scrubClosure(spark, SfDir).collect()
    assert(rows.map(_.getLong(1)).sum ==
      spark.read.parquet(s"$SfDir/documents.parquet").count())
    rows.foreach { r =>
      assert(r.getLong(3) >= r.getLong(2), "closure can only widen the direct flag set")
      assert(r.getLong(3) <= r.getLong(1), "flags bounded by docs")
    }
    // direct totals reconcile with p45's n_flagged column
    val direct = PipelineOps.scrub(spark, SfDir).collect().map(_.getLong(2)).sum
    assert(rows.map(_.getLong(2)).sum == direct)
  }

  test("drift monitor: slices partition the corpus, ppm rates and L1 are self-consistent") {
    val rows = PipelineOps.driftMonitor(spark, SfDir).collect()
    val total = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    assert(total == spark.read.parquet(s"$SfDir/documents.parquet").count())
    // floored ppm shares sum to 1e6 minus at most n_langs of flooring
    val ppmRef = rows.map(_.getLong(3)).sum
    assert(ppmRef <= 1000000L && ppmRef >= 1000000L - rows.length)
    // L1 equals the delta sum and is identical on every row
    val l1 = rows.map(_.getLong(6)).distinct
    assert(l1.length == 1 && l1.head == rows.map(_.getLong(5)).sum)
  }

  test("ann index refresh: build-half + append answers identically to the one-shot index") {
    val grown = PipelineOps.annIndexRefresh(spark, SfDir).collect().toSeq
    val oneShot = PipelineOps.annIndexed(spark, SfDir).collect().toSeq
    assert(grown == oneShot, "grow-in-place must be indistinguishable from a full rebuild")
  }

  test("ann index delta: tombstoned + appended index answers as a fresh build on the new snapshot") {
    import org.apache.spark.sql.functions._
    val seedBound = math.max(PipelineOps.IvfCentroids, PipelineOps.PqCentroids).max(10).toLong
    val got = PipelineOps.annIndexDelta(spark, SfDir).collect().toSeq
    // fresh build over the same carved new snapshot through the raw seams
    val newQ = PipelineOps.quantized(spark, SfDir)
      .select(col("vec_id"), col("q"), col("nrm"))
      .where(col("vec_id") < seedBound || col("vec_id") % 10 =!= 0)
      .localCheckpoint(false)
    val idx = java.nio.file.Files.createTempDirectory("graft-ann-fresh").toString
    PipelineOps.buildAnnIndexOf(newQ, idx)
    val fresh = PipelineOps.queryAnnIndex(spark, SfDir, idx).collect().toSeq
    assert(got == fresh, "delta-maintained index must answer as a from-scratch build")
    // a removed (tombstoned) vector must never surface as a neighbor
    assert(got.forall(r => !(r.getLong(2) >= seedBound && r.getLong(2) % 10 == 0)),
      "tombstoned ids leaked into the neighbor lists")
    assert(got.nonEmpty)
  }

  test("span scrub: ranges bound by span arithmetic and consistent with p30's census") {
    val rows = PipelineOps.spanScrub(spark, SfDir).collect()
    assert(rows.nonEmpty, "the fixture's 31-token vocabulary must repeat spans")
    rows.foreach { r =>
      val (nDocs, nRanges, toks, maxR) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nRanges >= nDocs, "every flagged doc carries at least one range")
      // a merged range covers at least one full window
      assert(toks >= nRanges * PipelineOps.SpanLen, "ranges at least window-sized")
      assert(maxR >= PipelineOps.SpanLen)
    }
    // p30 found corpus-wide repeated spans, so the scrubber must flag work
    val p30Rows = PipelineOps.dupSpans(spark, SfDir).collect()
    assert(p30Rows.forall(_.getLong(1) >= 2))
    assert(rows.map(_.getLong(3)).sum > 0)
  }

  test("ann index compaction folds tombstones into a rewrite with identical answers") {
    import org.apache.spark.sql.functions._
    val seedBound = math.max(PipelineOps.IvfCentroids, PipelineOps.PqCentroids).max(10).toLong
    val q = PipelineOps.quantized(spark, SfDir)
      .select(col("vec_id"), col("q"), col("nrm")).localCheckpoint(false)
    val oldQ = q.where(col("vec_id") < seedBound || col("vec_id") % 10 =!= 9)
    val newQ = q.where(col("vec_id") < seedBound || col("vec_id") % 10 =!= 0)
    val idx = java.nio.file.Files.createTempDirectory("graft-ann-compact").toString
    PipelineOps.buildAnnIndexOf(oldQ, idx)
    PipelineOps.appendAnnIndex(spark,
      newQ.join(oldQ.select("vec_id"), Seq("vec_id"), "left_anti"), idx)
    oldQ.select("vec_id").join(newQ.select("vec_id"), Seq("vec_id"), "left_anti")
      .write.mode("overwrite").parquet(s"$idx/tombstones.parquet")
    val before = PipelineOps.queryAnnIndex(spark, SfDir, idx).collect().toSeq
    val rowsBefore = spark.read.parquet(s"$idx/ivf_assign.parquet").count()
    PipelineOps.compactAnnIndex(spark, idx)
    assert(!new java.io.File(s"$idx/tombstones.parquet").exists,
      "compaction must consume the tombstones")
    assert(spark.read.parquet(s"$idx/ivf_assign.parquet").count() < rowsBefore,
      "compaction must physically reclaim rows")
    val after = PipelineOps.queryAnnIndex(spark, SfDir, idx).collect().toSeq
    assert(after == before, "compaction must not change a single answer")
    // idempotent: compacting an already-compacted index is a no-op
    PipelineOps.compactAnnIndex(spark, idx)
    assert(PipelineOps.queryAnnIndex(spark, SfDir, idx).collect().toSeq == before)
  }

  test("concurrent annIndexed invocations never race each other's index files") {
    // a multi-threaded serving layer may rebuild the same dataset's index
    // from two threads at once; each invocation must build into its own
    // version directory and answer from exactly that version (the
    // pre-fix failure mode was overwrite-vs-read interleaving on one
    // shared parquet tree)
    val results = new java.util.concurrent.ConcurrentHashMap[Int, Seq[org.apache.spark.sql.Row]]()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 2).map { i =>
      new Thread(() =>
        try results.put(i, PipelineOps.annIndexed(spark, SfDir).collect().toSeq)
        catch { case t: Throwable => errs.add(t) })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"concurrent invocation failed: ${Option(errs.peek()).map(_.getMessage)}")
    assert(results.get(0) == results.get(1),
      "both concurrent builds must answer identically (deterministic index)")
  }

  test("corpus delta seam: two genuinely distinct snapshot frames classify correctly") {
    import spark.implicits._
    val old = Seq((1L, "s1", "alpha"), (2L, "s1", "beta"), (3L, "s2", "gamma"))
      .toDF("doc_id", "source", "text")
    val neu = Seq((2L, "s1", "beta"), (3L, "s2", "gamma2"), (4L, "s2", "delta"))
      .toDF("doc_id", "source", "text")
    val by = PipelineOps.corpusDeltaOf(old, neu).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // s1: doc 1 removed ("alpha" leaves), doc 2 byte-identical
    assert(by("s1") == ((0L, 1L, 0L, 1L, 0L, 5L)), s"s1: ${by("s1")}")
    // s2: doc 3 changed (gamma -> gamma2), doc 4 added ("delta" arrives)
    assert(by("s2") == ((1L, 0L, 1L, 0L, 11L, 5L)), s"s2: ${by("s2")}")
  }

  test("drift monitor seam: a one-sided language carries its full ppm mass into L1") {
    import spark.implicits._
    val ref = Seq("en", "en", "fr", "de").toDF("lang")
    val cand = Seq("en", "en", "es", "es").toDF("lang")
    val rows = PipelineOps.driftMonitorOf(ref, cand).collect()
    val by = rows.map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(by("es") == ((0L, 2L, 0L, 500000L, 500000L)), s"es: ${by("es")}")
    assert(by("fr") == ((1L, 0L, 250000L, 0L, 250000L)), s"fr: ${by("fr")}")
    assert(by("en")._5 == 0L, "balanced language contributes no drift")
    // L1 = 0 (en) + 250k (fr) + 250k (de) + 500k (es)
    assert(rows.head.getLong(6) == 1000000L, "corpus L1 sums every one-sided delta")
  }

  test("corpus delta: classes partition the union of snapshots, char flows reconcile") {
    val rows = PipelineOps.corpusDelta(spark, SfDir).collect()
    val n = spark.read.parquet(s"$SfDir/documents.parquet").count()
    // union of snapshots = all docs (every doc is in old, new, or both)
    val classified = rows.map(r => r.getLong(1) + r.getLong(2) + r.getLong(3) + r.getLong(4)).sum
    assert(classified == n, "every doc classified exactly once")
    // the deterministic carving guarantees all four classes are non-empty
    (1 to 4).foreach(i => assert(rows.map(_.getLong(i)).sum > 0, s"class column $i empty"))
    rows.foreach { r =>
      assert(r.getLong(5) >= 0 && r.getLong(6) >= 0)
      // changed docs contribute to BOTH flows; added only in, removed only out
      if (r.getLong(3) == 0 && r.getLong(1) == 0) assert(r.getLong(5) == 0)
    }
  }

  test("dedup budget: stage totals nest, and reconcile with the p36 verdict") {
    val rows = PipelineOps.dedupBudget(spark, SfDir).collect()
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(3) && r.getLong(3) >= r.getLong(4),
        "each stage can only shrink the token budget")
      assert(r.getLong(5) <= r.getLong(1), "kept docs bounded by docs")
    }
    // docs_kept reconciles with the verdict's kept class, summed over sources
    val keptFromVerdict = PipelineOps.dedupVerdict(spark, SfDir).collect()
      .count(_.getString(1) == "kept")
    assert(rows.map(_.getLong(5)).sum == keptFromVerdict)
    // raw token total reconciles with p01's corpus-wide token count
    val p01Tokens = PipelineOps.textStats(spark, SfDir).collect().map(_.getLong(2)).sum
    assert(rows.map(_.getLong(2)).sum == p01Tokens)
  }

  test("dedup sensitivity: monotone in the threshold, τ=60 row equals p06 exactly") {
    val rows = PipelineOps.dedupSensitivity(spark, SfDir).collect()
    assert(rows.map(_.getLong(0)).toSeq == PipelineOps.SensitivityThresholds,
      "every threshold row present, ordered")
    // tightening the threshold can only shrink every column
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getLong(1) >= hi.getLong(1) && lo.getLong(2) >= hi.getLong(2) &&
        lo.getLong(3) >= hi.getLong(3), s"monotone between ${lo.getLong(0)} and ${hi.getLong(0)}")
    }
    // cross-operator exactness: the 60% row IS p06 (same machinery at 3/5)
    val p06Pairs = PipelineOps.ngramJaccard(spark, SfDir).collect()
    val r60 = rows.find(_.getLong(0) == 60L).get
    assert(r60.getLong(1) == p06Pairs.length, "τ=60 pair count must equal p06's")
    assert(r60.getLong(2) == p06Pairs.map(_.getLong(1)).distinct.length,
      "τ=60 dropped docs = distinct doc_b of p06's pairs")
  }

  test("keep-best verdict: same clusters as p36, canonical is the argmax-quality member") {
    val p36 = PipelineOps.dedupVerdict(spark, SfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val rows = PipelineOps.keepBestVerdict(spark, SfDir).collect()
    assert(rows.length == p36.size, "one verdict row per doc in both rules")
    // the cluster PARTITION is identical — only the representative moves:
    // docs sharing a p48 canonical are exactly the docs sharing a p36 one
    val by48 = rows.groupBy(_.getLong(2)).values.map(_.map(_.getLong(0)).toSet).toSet
    val by36 = p36.groupBy(_._2).values.map(_.map(_._1).toSet).toSet
    assert(by48 == by36, "canonical rule must not change the cluster partition")
    // every canonical is kept, and carries the cluster-max score
    val reason = rows.map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r => assert(reason(r.getLong(2)) == "kept") }
    // canonical_score is an upper bound on every SURVIVING member's score
    // (exact drops are byte-identical to a survivor, so survivors suffice)
    val score = {
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$SfDir/documents.parquet")
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"),
          (size(col("toks")) - lit(2) * expr(
            s"size(filter(toks, t -> array_contains(array(${PipelineOps.Stopwords.map(s => s"'$s'").mkString(", ")}), t)))"))
            .cast("long").as("s"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    rows.filter(r => r.getString(1) != "exact").foreach { r =>
      assert(r.getLong(3) >= score(r.getLong(0)),
        s"canonical score must dominate member ${r.getLong(0)}")
      assert(r.getLong(3) == score(r.getLong(2)), "canonical_score is the canonical's own score")
    }
  }

  test("source overlap matrix: ordered pairs, shared bounded by both sides") {
    val rows = PipelineOps.sourceOverlap(spark, SfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b, "one row per unordered pair, lexicographically oriented")
      val (na, nb, sh) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(sh >= 1 && sh <= math.min(na, nb), "shared set bounded by both sides")
      val j = r.getDouble(5)
      assert(j > 0.0 && j <= 1.0)
      assert(math.abs(j - sh.toDouble / (na + nb - sh).toDouble) == 0.0)
    }
    // per-source totals are consistent across every row they appear in
    val totals = rows.flatMap(r => Seq(r.getString(0) -> r.getLong(2), r.getString(1) -> r.getLong(3)))
    totals.groupBy(_._1).foreach { case (_, vs) => assert(vs.map(_._2).distinct.length == 1) }
  }

  test("training order: a deterministic permutation with exact per-shard token offsets") {
    val rows = PipelineOps.trainingOrder(spark, SfDir).collect()
    val n = spark.read.parquet(s"$SfDir/documents.parquet").count()
    assert(rows.length == n, "every doc gets exactly one slot")
    assert(rows.map(_.getLong(0)).distinct.length == n)
    val byShard = rows.groupBy(_.getLong(1))
    assert(byShard.keySet == (0L until PipelineOps.TrainShards.toLong).toSet,
      "the fixture populates every shard")
    byShard.values.foreach { sh =>
      val ordered = sh.sortBy(_.getLong(2))
      assert(ordered.map(_.getLong(2)).toSeq == (1L to sh.length.toLong),
        "positions are contiguous ranks within the shard")
      // start_tok is the exclusive running token sum in shard order
      ordered.foldLeft(0L) { (expect, r) =>
        assert(r.getLong(3) == expect, s"start_tok of doc ${r.getLong(0)}")
        expect + r.getLong(4)
      }
    }
    // content-independent hash order: a re-run reproduces the plan exactly
    assert(PipelineOps.trainingOrder(spark, SfDir).collect().toSeq == rows.toSeq)
  }

  test("training order: dropping docs never reorders the remainder (subset stability)") {
    import org.apache.spark.sql.functions.col
    val full = PipelineOps.trainingOrder(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // a downstream filter (dedup, quality) removes ~a third of the corpus;
    // the surviving docs must keep their shard AND relative order — a
    // training run can re-derive the plan after any filter without the
    // schedule reshuffling under it
    val sub = PipelineOps.trainingOrderOf(
      spark.read.parquet(s"$SfDir/documents.parquet").where(col("doc_id") % 3 =!= 0))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sub.length < full.length)
    val shardOf = full.map(t => t._1 -> t._2).toMap
    sub.foreach { case (id, shard, _) => assert(shard == shardOf(id), s"doc $id changed shard") }
    val surviving = full.filter(t => t._1 % 3 != 0)
    (0L until PipelineOps.TrainShards.toLong).foreach { s =>
      val before = surviving.filter(_._2 == s).sortBy(_._3).map(_._1).toSeq
      val after = sub.filter(_._2 == s).sortBy(_._3).map(_._1).toSeq
      assert(after == before, s"shard $s reordered")
    }
  }

  test("calibrated filter: each source drops its own bottom quartile, never more") {
    val rows = PipelineOps.calibratedFilter(spark, SfDir).collect()
    val nBySource = spark.read.parquet(s"$SfDir/documents.parquet")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getString(0)).toSet == nBySource.keySet, "every source reported")
    rows.foreach { r =>
      val (src, nDocs, nKept) = (r.getString(0), r.getLong(2), r.getLong(3))
      assert(nDocs == nBySource(src))
      val k = (nDocs * PipelineOps.CalibDropPct + 99) / 100
      // the threshold is the k-th smallest score, so strictly fewer than k
      // docs sit below it — the drop can never exceed the quartile
      assert(nDocs - nKept < k, s"$src dropped ${nDocs - nKept} >= k=$k")
      assert(nKept >= 1, "the percentile member itself always survives")
    }
  }

  test("embedding drift: cell censuses cover every assignable vector, ppm/L1 self-consistent") {
    val rows = PipelineOps.embeddingDrift(spark, SfDir).collect()
    import org.apache.spark.sql.functions.col
    val assignable = PipelineOps.quantized(spark, SfDir).where(col("nrm") > 0).count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == assignable,
      "both halves together census every nonzero-norm vector")
    val ppmRef = rows.map(_.getLong(3)).sum
    assert(ppmRef <= 1000000L && ppmRef >= 1000000L - rows.length,
      "floored ppm shares sum to 1e6 minus at most one unit per cell")
    val l1 = rows.map(_.getLong(6)).distinct
    assert(l1.length == 1 && l1.head == rows.map(_.getLong(5)).sum)
  }

  test("dataset card: per-source classes partition the docs and reconcile with the verdict") {
    val rows = PipelineOps.datasetCard(spark, SfDir).collect()
    val n = spark.read.parquet(s"$SfDir/documents.parquet").count()
    assert(rows.map(_.getLong(1)).sum == n, "cards cover the whole corpus")
    rows.foreach { r =>
      assert(r.getLong(6) + r.getLong(7) + r.getLong(8) == r.getLong(1),
        "kept + exact + near partition each source's docs")
      assert(r.getLong(2) >= 1, "at least one language per source")
    }
    val ppm = rows.map(_.getLong(5)).sum
    assert(ppm <= 1000000L && ppm >= 1000000L - rows.length)
    // the dedup split reconciles with p36's verdict corpus-wide
    val kept = PipelineOps.dedupVerdict(spark, SfDir).collect()
      .count(_.getString(1) == "kept")
    assert(rows.map(_.getLong(6)).sum == kept)
  }

  test("dataset card delta: the delta-maintained card equals the from-scratch card of the new snapshot") {
    import org.apache.spark.sql.functions._
    val got = PipelineOps.datasetCardDelta(spark, SfDir).collect().toSeq
    val newDf = spark.read.parquet(s"$SfDir/documents.parquet")
      .where(col("doc_id") % 10 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 7 === 3, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val fresh = PipelineOps.datasetCardOf(newDf,
      PipelineOps.dedupVerdictOf(newDf).select(col("doc_id"), col("reason")))
      .collect().toSeq
    assert(got == fresh, "delta path must be invisible in the published card")
    assert(got.nonEmpty)
  }

  test("ann recall: one row per query, hits bounded by k, corpus recall is the exact mean") {
    val rows = PipelineOps.annRecall(spark, SfDir).collect()
    assert(rows.length == 10, "one report row per eval query")
    rows.foreach { r =>
      val (hits, ppm) = (r.getLong(1), r.getLong(2))
      assert(hits >= 0 && hits <= PipelineOps.PqTopK)
      assert(ppm == hits * 1000000L / PipelineOps.PqTopK)
    }
    val corpus = rows.map(_.getLong(3)).distinct
    assert(corpus.length == 1 &&
      corpus.head == rows.map(_.getLong(1)).sum * 1000000L / (rows.length * PipelineOps.PqTopK))
    // regression floor, matching AnnRecallSpec: the deliberately tiny
    // untrained config measures ~0.28 here (vs ~0.01 random chance); a
    // routing/ADC break craters it to ~0 — that is what this catches
    assert(corpus.head >= 150000L, s"corpus recall ${corpus.head} ppm — routing/ADC regressed")
  }

  test("survivorsOf: exactly one survivor per content hash, the min doc_id, " +
       "its own row carried — on a duplicate-heavy frame") {
    // pins the min_by-aggregate rewrite's contract at its boundary: doc_id
    // is unique per snapshot (the documented input contract), so the min
    // is unique and the window form and the aggregate form agree; this
    // asserts the invariant every consumer (DedupStream refresh inputs,
    // the ingest-bump chains) actually relies on
    import spark.implicits._
    val d = Seq(
      (10L, "alpha beta", "en", "s1", 10L),
      (3L,  "alpha beta", "de", "s2", 10L),   // same text, lower id wins
      (7L,  "alpha beta", "fr", "s3", 10L),
      (5L,  "gamma", "en", "s1", 5L),
      (1L,  "delta", "en", "s9", 5L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val s = PipelineOps.survivorsOf(d).collect()
    assert(s.length == 3, "one survivor per distinct text")
    val byText = s.map(r => r.getString(1) -> r).toMap
    val dup = byText("alpha beta")
    assert(dup.getLong(0) == 3L, "min doc_id wins")
    assert(dup.getString(2) == "de" && dup.getString(3) == "s2",
      "the surviving row carries ITS OWN columns, not another tied row's")
    assert(s.map(_.getString(5)).distinct.length == 3, "content_hash carried")
  }
}
