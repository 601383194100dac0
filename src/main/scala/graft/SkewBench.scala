package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.{Hashing, PipelineOps}

/** Adversarial-skew stress for the hot-bucket-capped dedup operators and
  * the connected-components contraction — converts the caps' plan-shape
  * claims into measured evidence (SCALING.md "Adversarial skew").
  *
  * Generates two same-size document/embedding fixtures:
  *   - `uniform`: every doc/vector independent — LSH buckets stay near
  *     their expected size, no cap fires;
  *   - `skewed`: power-law template clusters (the dominant one holds 1/4
  *     of the corpus) and a 30% near-identical embedding mass — every
  *     band bucket those clusters touch overflows, the exact skew shape
  *     a scraped 100 TB corpus has.
  * Then times p04 (minhash LSH), p35 (simhash blocks), p14 (embedding
  * LSH) on both fixtures, capped (shipped [[Hashing.MaxBucketSize]]) and
  * uncapped (override = MaxValue), reporting per-fixture bucket stats
  * (max bucket, rows the cap drops) from the operators' own banding
  * probes. Separately stresses distributed connected components with a
  * power-law component-size graph vs a uniform one at equal edge count.
  *
  * Usage: runMain graft.SkewBench [nDocs] [nVecs] [ccNodes]
  * Writes skewbench_out.json (one JSON object per line). */
object SkewBench {

  private def tok(seed: String): String =
    "w" + java.lang.Long.toHexString(Hashing.md5Long(seed, 10))
  private def unitVal(seed: String): Float =
    (Hashing.md5Long(seed, 8) % 2001L - 1000L) / 1000.0f

  /** Power-law cluster sizes: n/4, n/8, ... down to 8, singletons after. */
  private def clusterSizes(n: Int): Seq[Int] = {
    val big = Iterator.iterate(n / 4)(_ / 2).takeWhile(_ >= 8).toSeq
    big ++ Seq.fill(n - big.sum)(1)
  }

  def main(args: Array[String]): Unit = {
    val nDocs   = args.lift(0).map(_.toInt).getOrElse(8000)
    val nVecs   = args.lift(1).map(_.toInt).getOrElse(8000)
    val ccNodes = args.lift(2).map(_.toInt).getOrElse(400000)

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-skewbench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("graft-skew").toString

    // in-run host-throughput anchor (see CalibrationProbe): emitted as the
    // first report line so the snapshot's absolute seconds are comparable
    // across captures — the round-10 snapshot was taken on a 1.3-3× slower
    // host and its absolute numbers confused the cross-round read
    val probeSec = CalibrationProbe.measure(spark)

    // ------------------------------------------------------------ fixtures
    def doc(id: Long, toks: Seq[String], source: String) = {
      val text = toks.mkString(" ")
      (id, text, "en", source, text.length.toLong)
    }
    val uniformDocs = (0 until nDocs).map { i =>
      doc(i.toLong, (0 until 40).map(t => tok(s"u-$i-$t")), s"s${i % 20}")
    }
    // skewed: cluster k's members share a 40-token template with 2
    // member-unique mutations — pairwise shingle Jaccard ~0.66 (> the 0.5
    // verify threshold), so every within-cluster pair IS a true near-dup;
    // the dominant cluster keeps ONE source so source-blocked operators
    // see the skew too
    val skewedDocs = {
      var id = -1L
      clusterSizes(nDocs).zipWithIndex.flatMap { case (sz, k) =>
        val tmpl = (0 until 40).map(t => tok(s"tmpl-$k-$t"))
        (0 until sz).map { j =>
          id += 1
          val m1 = j % 40; val m2 = (j * 7 + 3) % 40
          val toks = tmpl.zipWithIndex.map { case (w, p) =>
            if (sz > 1 && (p == m1 || p == m2)) tok(s"mut-$k-$j-$p") else w
          }
          doc(id, toks, s"s${k % 20}")
        }
      }
    }
    val uniformVecs = (0 until nVecs).map { i =>
      (i.toLong, (0 until Hashing.EmbDim).map(d => unitVal(s"v-$i-$d")), 0)
    }
    // skewed: 30% of vectors = one base direction + 0.1% jitter (cosine
    // ~1.0 pairwise — true near-dups, one dominant bucket in every band)
    val skewedVecs = (0 until nVecs).map { i =>
      val vec =
        if (i < nVecs * 3 / 10)
          (0 until Hashing.EmbDim).map(d => unitVal(s"base-$d") + 0.001f * unitVal(s"j-$i-$d"))
        else (0 until Hashing.EmbDim).map(d => unitVal(s"v-$i-$d"))
      (i.toLong, vec, 0)
    }

    // tail-skewed: the same 30% near-identical mass, but at the HIGHEST
    // vec_ids. p14's banding is id-agnostic, but p44 seeds its cells from
    // the lowest ids — with the mass at the head, the seeds themselves are
    // near-identical and the mass SPLITS across them (max cell ~2× uniform,
    // cap never fires); with the mass at the tail, the seeds are unique
    // vectors and the whole mass lands in its single nearest cell
    val skewedTailVecs = (0 until nVecs).map { i =>
      val vec =
        if (i >= nVecs * 7 / 10)
          (0 until Hashing.EmbDim).map(d => unitVal(s"base-$d") + 0.001f * unitVal(s"j-$i-$d"))
        else (0 until Hashing.EmbDim).map(d => unitVal(s"v-$i-$d"))
      (i.toLong, vec, 0)
    }

    for ((name, ds, vs) <- Seq(
        ("uniform", uniformDocs, uniformVecs), ("skewed", skewedDocs, skewedVecs),
        ("skewtail", Seq.empty, skewedTailVecs))) {
      if (ds.nonEmpty)
        ds.toDF("doc_id", "text", "lang", "source", "n_chars")
          .coalesce(4).write.mode("overwrite").parquet(s"$base/$name/documents.parquet")
      vs.toDF("vec_id", "embedding", "label")
        .coalesce(4).write.mode("overwrite").parquet(s"$base/$name/embeddings.parquet")
    }

    val out = new StringBuilder
    def report(fields: (String, Any)*): Unit = {
      val line = fields.map {
        case (k, v: String) => s""""$k":"$v""""
        case (k, v: Double) => f""""$k":$v%.2f"""
        case (k, v)         => s""""$k":$v"""
      }.mkString("{", ",", "}")
      println(line); out.append(line).append('\n'); ()
    }
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    report("kind" -> "probe", "probe_sec" -> probeSec)

    // ------------------------------------------- bucket stats (probe pass)
    for ((fixture, probe) <- Seq(
        ("uniform", "p04"), ("skewed", "p04"),
        ("uniform", "p35"), ("skewed", "p35"),
        ("uniform", "p14"), ("skewed", "p14"))) {
      val dir = s"$base/$fixture"
      val b = probe match {
        case "p04" => PipelineOps.minhashBuckets(spark, dir)
        case "p35" => PipelineOps.simhashBuckets(spark, dir)
        case _     => PipelineOps.embDedupBuckets(spark, dir)
      }
      val stats = b.groupBy("band", "bkey").count()
        .agg(max("count").as("max_bucket"),
          sum(when(col("count") > Hashing.MaxBucketSize, col("count")).otherwise(0L)).as("rows_dropped"),
          sum("count").as("rows_total"))
        .collect()(0)
      report("kind" -> "buckets", "op" -> probe, "fixture" -> fixture,
        "max_bucket" -> stats.getLong(0), "rows_over_cap" -> stats.getLong(1),
        "rows_total" -> stats.getLong(2))
    }

    // ------------------------------------------------- operator wall times
    val ops: Seq[(String, String => DataFrame)] = Seq(
      ("p04_minhash", dir => PipelineOps.minhashPairs(spark, dir)),
      ("p35_simhash", dir => PipelineOps.simhashPairs(spark, dir)),
      ("p14_embdedup", dir => PipelineOps.embDedup(spark, dir)))
    for ((opName, op) <- ops; fixture <- Seq("uniform", "skewed");
         capped <- Seq(true, false)) {
      PipelineOps.maxBucketSizeOverride = if (capped) None else Some(Int.MaxValue)
      try {
        val (n, sec) = timed(op(s"$base/$fixture").count())
        report("kind" -> "op", "op" -> opName, "fixture" -> fixture,
          "capped" -> capped, "rows" -> n, "sec" -> sec)
      } finally PipelineOps.maxBucketSizeOverride = None
    }

    // --------------------------------------- semantic-dedup cell skew (p44)
    // skewtail's 30% near-identical mass lands in ONE cell (~2.4k vectors
    // at the default nVecs), far over SemMaxCell: capped, pairing skips
    // it; uncapped, that single cell is ~2.9M exact-cosine pairs — the
    // blowup the cap exists to bound. (head-skewed is also probed: there
    // the mass contains the seeds and SPLITS, the cap correctly idle.)
    for (fixture <- Seq("uniform", "skewed", "skewtail")) {
      val dir = s"$base/$fixture"
      val q = PipelineOps.quantized(spark, dir)
        .select(col("vec_id"), col("q"), col("nrm")).localCheckpoint(false)
      val k = PipelineOps.semCells(nVecs.toLong)
      val stats = PipelineOps.semAssign(q, PipelineOps.semCents(q, k))
        .groupBy("cid").count()
        .agg(max("count").as("max_cell"),
          sum(when(col("count") > PipelineOps.SemMaxCell, col("count")).otherwise(0L)).as("rows_over_cap"),
          sum("count").as("rows_total"))
        .collect()(0)
      report("kind" -> "cells", "op" -> "p44", "fixture" -> fixture,
        "max_cell" -> stats.getLong(0), "rows_over_cap" -> stats.getLong(1),
        "rows_total" -> stats.getLong(2))
      for (capped <- Seq(true, false)) {
        val cap = if (capped) PipelineOps.SemMaxCell else Int.MaxValue
        // aggregate over `kept`, NOT count(): the verdict is left-joins on
        // unique keys, so a bare count() lets Catalyst eliminate the whole
        // pair stage and times nothing
        val (dropped, sec) = timed(PipelineOps
          .semDedupParam(spark, dir, k, cap, PipelineOps.SemDupThreshold)
          .agg(sum(lit(1L) - col("kept"))).collect()(0).getLong(0))
        report("kind" -> "op", "op" -> "p44_semdedup", "fixture" -> fixture,
          "capped" -> capped, "dropped" -> dropped, "sec" -> sec)
      }
    }

    // -------------------------------------- connected components under skew
    // power-law: component sizes n/2, n/4, ... (chains — the worst diameter
    // shape); uniform: all components size 4 at the same edge count
    def chainEdges(ids: Range): Seq[(Long, Long)] =
      ids.dropRight(1).map(i => (i.toLong, i.toLong + 1))
    val plSizes = Iterator.iterate(ccNodes / 2)(_ / 2).takeWhile(_ >= 2).toSeq
    var off = 0
    val plEdges = plSizes.flatMap { s => val e = chainEdges(off until (off + s)); off += s; e }
    val nUniformComps = plEdges.size / 3
    val uniEdges = (0 until nUniformComps).flatMap { c =>
      chainEdges((c * 4) until (c * 4 + 4))
    }
    for ((name, edges) <- Seq(("powerlaw", plEdges), ("uniform", uniEdges))) {
      val df = edges.toDF("a", "b").repartition(32)
      // threshold 0: always the distributed star-contraction path (the
      // 100 TB path — the driver union-find tail would otherwise absorb
      // anything under 128k edges)
      val (n, sec) = timed(
        PipelineOps.connectedComponents(df, 0L).groupBy("label").count().count())
      report("kind" -> "cc", "graph" -> name, "edges" -> edges.size,
        "components" -> n, "sec" -> sec)
    }

    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("skewbench_out.json"), out.toString)
    // best-effort fixture cleanup
    scala.reflect.io.Directory(new java.io.File(base)).deleteRecursively()
    spark.stop()
  }
}
