package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.pipeline.PipelineOps
import graft.pipeline.PipelineOps.PinnedFrame

/** The ingest-version-bump driver: ONE orchestrated pass that takes the
  * corpus from snapshot N to snapshot N+1 across every maintained
  * artifact — the composition the CDC trilogy (p61 text / p62 vector /
  * p63 ANN-index deltas) exists for. Where p61/p62/p63 each prove one
  * family's delta path against a from-scratch oracle by re-ingesting the
  * old snapshot in-query, this driver is the PRODUCTION shape: carried
  * state lives in [[StateStore]] (marker-committed versioned parquet,
  * DFS via Hadoop-FS routing), the ANN index is a persistent
  * grow-in-place segment tree ([[graft.pipeline.AnnIndexStore]]), and
  * each `bump(newSnapshot)` call pays only the delta:
  *
  *   1. text dedup — retire departed/changed docs from the carried
  *      gram/edge state ([[DedupStream.retain]]), re-gram the delta as
  *      one incremental batch, emit the new snapshot's p36 verdict;
  *   2. p60 refresh — optionally PUBLISH that verdict as the
  *      materialized verdict table of the new snapshot's dataset dir, so
  *      every downstream composer (budget, splits, scrub closure,
  *      dataset card) serves the ingest in O(scan) without the
  *      build-once seam ever re-running corpus-scale dedup;
  *   3. semantic dedup — retire departed vectors (with reopened-cell
  *      rebuild, [[SemDedupStream.retain]]) and refresh arrivals against
  *      the frozen seed quantizer;
  *   4. ANN index — append arrivals through the frozen persisted
  *      quantizer, tombstone departures, and COMPACT when the tombstone
  *      ratio crosses [[PipelineOps.CompactTombstoneRatio]] (the
  *      LSM-style reclaim economics, measured in SCALING.md).
  *
  * Cost per bump is O(delta + state) for pair discovery and O(snapshot
  * hash projections) for verdict assembly — never a corpus re-gram, a
  * corpus re-pair, or an index rebuild. The p71 entry gates the chained
  * driver (two consecutive bumps) under p36's own oracle on the final
  * snapshot; IngestBumpSpec drives all four artifact families across a
  * three-snapshot chain against from-scratch oracles, through a
  * state-on-disk restart.
  *
  * Crash contract: each family's state commits via StateStore's
  * per-version CREATE-EXCLUSIVE `_COMMITTED` marker (object-store-safe
  * under a conditional-create-capable connector; see [[StateStore]]'s
  * capability probe), so a crash mid-bump leaves every
  * family at EITHER snapshot N or N+1, and re-running the bump converges:
  * the text/sem refreshes are idempotent (valid-id retirement and
  * membership anti-joins make a replayed delta a no-op), the index
  * bump derives arrivals/departures from the index's OWN live set rather
  * than the state tables, so a replay appends nothing and re-tombstones
  * nothing, and summary folds stamp the bump identity so a replayed fold
  * is a no-op instead of a double-count ([[bumpSummaries]]). Single concurrent bumper per root (the ingest pipeline's
  * natural shape); two racing bumpers degrade to
  * highest-committed-version-wins between internally-consistent versions,
  * never a torn state.
  *
  * Reference: the reference engine has no ingest maintenance at all (a
  * schema reload is a full flush, tesseract-server `handlers/flush.rs`);
  * this driver is the beyond-parity lifecycle a 100 TB training-data
  * pipeline needs. */
object IngestBump {

  /** The per-snapshot outputs: the text verdict (p36 shape: doc_id,
    * reason, canonical_id) and, when vectors ride the bump, the semantic
    * verdict (p44 shape) and/or the trained-quantizer verdict (p52
    * shape). All carry a LAZY local checkpoint: an intermediate bump's
    * unread verdict costs nothing (the chain entry evaluates only the
    * final one), and the first evaluation pins the result off the state
    * files. Evaluate within one further bump — StateStore keeps each
    * state version alive for exactly one more save cycle. */
  final case class Artifacts(
      verdict: DataFrame,
      semVerdict: Option[DataFrame],
      trainedVerdict: Option[DataFrame] = None)

  /** The vector half of a snapshot: quantized vectors (vec_id, q, nrm)
    * plus the FROZEN seed quantizer (trained once, versioned with the
    * deployment — exactly how production coarse quantizers ship). */
  final case class VectorSnapshot(
      vecs: DataFrame,
      cents: DataFrame,
      maxCell: Int = PipelineOps.SemMaxCell,
      threshold: Double = PipelineOps.SemDupThreshold)

  /** The TRAINED-quantizer half of a snapshot (the p52/p55 lifecycle):
    * quantized vectors plus the frozen trained centroids
    * ([[PipelineOps.trainCentroids]]'s (cid, qb, nrm_b) shape) —
    * membership is top-2 probe cells against the broadcast quantizer. */
  final case class TrainedSnapshot(
      vecs: DataFrame,
      trained: DataFrame,
      maxCell: Int = PipelineOps.SemMaxCell,
      threshold: Double = PipelineOps.SemDupThreshold)

  private def textDir(root: String) = s"$root/text"
  private def semDir(root: String) = s"$root/sem"
  private def trainedStateDir(root: String) = s"$root/trained"

  /** The persistent ANN index tree under a bump root (query it with the
    * p49 query half). */
  def indexDir(root: String): String = s"$root/ann"

  /** A registered OLAP summary riding the bump: the Preagg store of one
    * grain, maintained per fact delta through the same StateStore commit
    * protocol the dedup families use. `partialsOf` computes a fact
    * DELTA's store-schema partial summary ([[graft.plan.Preagg]]'s
    * `summaryFrame` over a planner whose fact slot is the delta);
    * `combine` is the cube's re-agg merge (`Preagg.mergeSummaries` —
    * sums/counts add, min/min, max/max, KMV sketches union losslessly).
    * Per bump the store pays O(delta + summary), never a fact rescan,
    * and [[summaryPath]] hands the committed store to the SAME
    * PreaggPlanner / LogicLayer routing a batch-materialized summary
    * uses. */
  final case class SummarySpec(
      name: String,
      partialsOf: DataFrame => DataFrame,
      combine: (DataFrame, DataFrame) => DataFrame)

  private def summaryDir(root: String, name: String) = s"$root/summary/$name"

  /** Deterministic identity of a fact delta's content: an
    * order-insensitive xxhash64 fold over every column of every row plus
    * the row count — one O(delta) aggregate, the default replay stamp
    * when the caller has no external bump id. */
  private def contentId(delta: DataFrame): String = {
    // sum in decimal(38,0): ANSI mode makes a long sum of hashes overflow
    val r = delta
      .select(xxhash64(struct(delta.columns.map(col): _*))
        .cast("decimal(38,0)").as("h"))
      .agg(sum(col("h")), count(lit(1))).collect()(0)
    s"${r.get(0)}_${r.getLong(1)}"
  }

  /** The replay stamp of `dir`'s committed store — the bump identity its
    * summary last folded. None for a store predating the stamp (treated
    * as unknown: the fold applies, matching the pre-stamp behavior). */
  private def lastApplied(spark: SparkSession, dir: String): Option[String] =
    StateStore.currentTablePath(spark, dir, "applied").flatMap { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(hp)) None
      else spark.read.parquet(p).select("bump_id").collect()
        .headOption.map(_.getString(0))
    }

  /** Fold one fact delta into every registered summary store under
    * `root` — the OLAP half of an ingest bump. Each store commits as its
    * own StateStore version (crash leaves it at N or N+1; the previous
    * version survives one cycle for in-flight readers, so the merge's
    * lazy read of version N while writing N+1 is safe).
    *
    * Replay idempotency (the same crash contract as the other four
    * maintained families): every commit stamps the bump's identity —
    * `bumpId` when the ingest provides one, else the delta's content
    * hash — alongside the summary, and a fold whose identity matches the
    * committed stamp is a no-op, so re-running an already-completed
    * `bump()` (at-least-once recovery) cannot double-count. The content
    * default makes recovery safe with no caller wiring; a feed that can
    * legitimately deliver byte-identical CONSECUTIVE fact deltas must
    * pass its own `bumpId` (an offset/epoch), since content alone cannot
    * tell that apart from a replay. Stamps are compared per store, so a
    * crash between two specs' commits recovers each store independently.
    *
    * Write economics (measured in SCALING.md): the store is
    * READ-optimized — one parquet path the Preagg router scans with no
    * fold — so each bump rewrites the merged summary, O(summary rows)
    * per bump. That is the right trade while summaries are grain-sized
    * (queries ≫ bumps, and a grain is dim-cardinality, orders below the
    * fact); a grain whose cardinality approaches the fact's would pay
    * real write amplification here AND would defeat the summary's
    * purpose (scan ≈ fact scan), so the bound is structural: register
    * grains, not near-fact keys. */
  def bumpSummaries(
      spark: SparkSession,
      root: String,
      factDelta: DataFrame,
      specs: Seq[SummarySpec],
      bumpId: Option[String] = None): Unit = {
    if (specs.isEmpty) return
    lazy val id = bumpId.getOrElse(contentId(factDelta))
    specs.foreach { s =>
      val dir = summaryDir(root, s.name)
      val stamp = spark.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(id)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("bump_id",
            org.apache.spark.sql.types.StringType, nullable = false))))
      StateStore.load(spark, dir, Seq("summary")) match {
        case Some(_) if lastApplied(spark, dir).contains(id) => () // replay: no-op
        case Some(m) =>
          val merged = s.combine(m("summary"), s.partialsOf(factDelta))
          StateStore.save(dir, Map("summary" -> merged, "applied" -> stamp))
        case None =>
          StateStore.save(dir,
            Map("summary" -> s.partialsOf(factDelta), "applied" -> stamp))
      }
    }
  }

  /** The committed summary store's parquet path under a bump root — what
    * a serving layer points its summary TableDef at (re-resolve after
    * each bump; the previous version's path stays readable for one save
    * cycle). None before the first fold. */
  def summaryPath(spark: SparkSession, root: String, name: String): Option[String] =
    StateStore.currentTablePath(spark, summaryDir(root, name), "summary")

  /** Advance every artifact under `root` to `newDocs` (+ optional vector
    * snapshot); returns the new snapshot's verdicts. `publishDir`: the
    * dataset directory whose materialized p60 verdict table this verdict
    * IS — the ingest updates the table in O(delta + state), where the
    * build-once seam would pay a full corpus dedup. `factDelta` +
    * `summaries`: the OLAP fact rows that arrived with this ingest and
    * the registered Preagg stores they fold into ([[bumpSummaries]]) —
    * the fifth maintained family. */
  def bump(
      spark: SparkSession,
      root: String,
      newDocs: DataFrame,
      vectors: Option[VectorSnapshot] = None,
      publishDir: Option[String] = None,
      trainedVectors: Option[TrainedSnapshot] = None,
      factDelta: Option[DataFrame] = None,
      summaries: Seq[SummarySpec] = Nil,
      bumpId: Option[String] = None): Artifacts = {
    val verdict = bumpText(spark, textDir(root), newDocs)
    publishDir.foreach(d => PipelineOps.publishVerdictTable(spark, d, verdict))
    val sem = vectors.map { vs =>
      val sv = bumpSem(spark, semDir(root), vs)
      bumpIndex(spark, indexDir(root), vs.vecs)
      sv
    }
    val tv = trainedVectors.map(ts => bumpTrained(spark, root, ts))
    factDelta.foreach(fd => bumpSummaries(spark, root, fd, summaries, bumpId))
    Artifacts(verdict, sem, tv)
  }

  /** Trained-quantizer family: same LSM cadence and retire-then-refresh
    * shape as [[bumpSem]], against the frozen TRAINED multi-probe
    * quantizer — the p52/p55 production lifecycle (train once over the
    * backlog, catch-up/serve through maintained state) now rides the
    * composed ingest driver with O(delta) persistence. Public as its own
    * entry point too: a vector-only deployment bumps this family without
    * carrying a document corpus (the p73 chain does exactly that). */
  def bumpTrained(
      spark: SparkSession, root: String, ts: TrainedSnapshot): DataFrame =
    bumpTrainedAt(spark, trainedStateDir(root), ts)

  private def bumpTrainedAt(
      spark: SparkSession, dir: String, ts: TrainedSnapshot): DataFrame = {
    val snapNames = Seq("members", "edges")
    val deltaNames = Seq("retired", "cellsOut", "members", "edges")
    val st = StateStore.loadChain(spark, dir, snapNames, deltaNames)
      .map { case (snap, ds) => SemDedupStream.foldTrainedChain(snap, ds) } match {
      case None =>
        val (st, _) = SemDedupStream.refreshTrainedDelta(
          ts.trained, ts.vecs, None, ts.maxCell, ts.threshold)
        StateStore.save(dir, Map("members" -> st.members, "edges" -> st.edges))
        st
      case Some(m) =>
        val retired = m.members.select("vec_id").distinct()
          .join(ts.vecs.select("vec_id"), Seq("vec_id"), "left_anti")
          .pinned(false)
        val (prior, reopened, rebuilt) =
          SemDedupStream.retireTrained(m, retired, ts.maxCell, ts.threshold)
        val (st, sd) = SemDedupStream.refreshTrainedDelta(
          ts.trained, ts.vecs, Some(prior), ts.maxCell, ts.threshold)
        if (StateStore.chainLength(spark, dir) + 1 >= SnapshotEvery)
          StateStore.save(dir, Map("members" -> st.members, "edges" -> st.edges))
        else
          StateStore.saveDelta(dir, Map(
            "retired" -> retired, "cellsOut" -> reopened,
            "members" -> sd.membersIn,
            "edges" -> rebuilt.unionByName(sd.edgesIn)))
        st
    }
    SemDedupStream.trainedVerdict(ts.vecs.select("vec_id").distinct(), st, ts.maxCell)
      .pinned(false)
  }

  /** A CDC delta feed — the shape an ingest log provides: ids whose docs
    * left the corpus, changed docs (full new bodies, live ids), added
    * docs (fresh ids). The three are disjoint by doc_id. */
  final case class CorpusDelta(
      removedIds: DataFrame, changed: DataFrame, added: DataFrame)

  private val DocCols = Seq("doc_id", "text", "lang", "source", "n_chars")

  /** Text-family bump fed by a CDC DELTA instead of a full snapshot.
    * [[bump]] must re-hash the whole snapshot to discover what changed —
    * an O(corpus text) scan per ingest; this path trusts the feed, so
    * the only text that is ever hashed or grammed is the delta's
    * (changed ∪ added ∪ promoted). Per bump it pays O(delta text) +
    * corpus-HASH-projection shuffles (the 40-byte-row live log that
    * survivor selection and verdict assembly are defined over) +
    * state-projection anti-joins — never a corpus text scan, never a
    * state rewrite (delta persistence via [[StateStore.saveDelta]]).
    *
    * `corpus` is the NEW snapshot's documents frame, consulted ONLY to
    * fetch the bodies of PROMOTED survivors — an old non-survivor whose
    * exact-duplicate survivor just departed, the one body the feed
    * cannot carry. That lookup is a delta-sized id semi-join (with an
    * id-partitioned corpus layout it partition-prunes; promotions only
    * happen when an exact-dup's keeper leaves, so the matched set is
    * tiny). Verdict ≡ [[bump]] on the same snapshot — spec-gated and
    * entry-gated (p72) under p36's own oracle.
    *
    * TRUST-BUT-VERIFY: the path trusts the feed for the delta's
    * membership, but a feed bug (a missed removal, a missed add, a
    * changed doc delivered as added) would silently corrupt the
    * maintained verdict until the next full [[bump]]. Every bump
    * therefore audits a deterministic 1-in-`auditSampleMod` sample in
    * each direction — corpus rows (sampled per (source, doc_id), so a
    * bug confined to a SMALL source gets its own 1/mod per-doc trial
    * density rather than inheriting whole-corpus luck) must appear
    * verbatim in the post-bump live log, and live-log rows (uniform
    * doc-id sample) must appear in the corpus under the same hash — and
    * FAILS the bump loudly on any divergence, BEFORE any state commits.
    * The audit hashes ~2/mod of the corpus text per bump; a single
    * corrupt doc is caught with probability 1/mod per bump, so after b
    * bumps a standing feed bug survives with probability (1−1/mod)^b —
    * at the default 64, under 21% after 100 bumps, under 0.05% after
    * 500 — while every MASS feed bug (a dropped partition, a stuck
    * topic) is caught on the next bump with near-certainty.
    * `auditSampleMod = 1` audits the full corpus (what the spec's
    * lying-feed injections use); `auditSampleMod = 0` disables. */
  def bumpTextCdc(
      spark: SparkSession,
      root: String,
      delta: CorpusDelta,
      corpus: DataFrame,
      publishDir: Option[String] = None,
      auditSampleMod: Long = 64L): DataFrame = {
    val dir = textDir(root)
    val m = loadTextState(spark, dir).getOrElse(throw new IllegalStateException(
      "bumpTextCdc needs an ingested base — run bump() on the first snapshot"))
    val deltaDocs = delta.changed.select(DocCols.map(col): _*)
      .unionByName(delta.added.select(DocCols.map(col): _*))
      .pinned(false)
    // a changed doc departs the log under its old hash and re-enters via
    // the delta log under its new one
    val departed = delta.removedIds.select("doc_id")
      .unionByName(delta.changed.select("doc_id")).pinned(false)
    val retainedLog = m("livelog").join(departed, Seq("doc_id"), "left_anti")
    // replay idempotency: on a re-run of an already-committed bump the
    // feed's added docs are ALREADY in the carried livelog (and not in
    // `departed`), so a raw union would duplicate their rows — and the
    // duplicate would persist in the saved delta chain, duplicating every
    // later verdict. Anti-join the arrivals against the retained log on
    // the full (doc_id, content_hash) key (mirroring bumpText's logDelta)
    // so a replayed arrival is a no-op; this filtered delta is also what
    // the chain persists as its livelog table. The anti-join's build side
    // is the retained log RESTRICTED to the delta's ids — delta-sized and
    // broadcast, where the raw retained log would build corpus-sized.
    val deltaLog = DedupStream.arrivalLog(deltaDocs)
      .join(retainedLog.join(deltaDocs.select("doc_id"), Seq("doc_id"), "left_semi"),
        Seq("doc_id", "content_hash"), "left_anti")
      .pinned(false)
    val livelog = retainedLog.unionByName(deltaLog)
    // trust-but-verify stays SEQUENTIAL: its frames share the bump's lazy
    // delta pins (deltaLog, livelog), and overlapping it from a future
    // races their first materialization against the main derivation —
    // measured 2.5× slower end-to-end, not faster (same lesson as the
    // refresh probes; see IncrementalCc.refresh)
    if (auditSampleMod > 0) auditFeed(livelog, corpus, auditSampleMod)
    // touched-hash survivor re-selection: survivor(h) can only change
    // when h's MEMBERSHIP changed — h lost a row (a departed doc's old
    // hash) or gained one (a delta arrival). The min-per-hash window
    // therefore runs over only the touched slice of the live log (a
    // delta-sized broadcast semi-join), and every untouched hash keeps
    // its carried survivor row. From here EVERY derivation stays either a
    // corpus-projection SCAN with a delta-sized broadcast build side or a
    // delta×delta operation — no corpus shuffle anywhere in the bump (the
    // dominant residual the CDC marginal probe exposed was exactly the
    // old corpus-wide window + the survivor/valid corpus-corpus joins).
    val touched = m("livelog").join(departed, Seq("doc_id"), "left_semi")
      .select("content_hash")
      .unionByName(deltaLog.select("content_hash"))
      .distinct().pinned(false)
    val sw = Window.partitionBy(col("content_hash"))
    val reselected = livelog.join(touched, Seq("content_hash"), "left_semi")
      .withColumn("__min", min(col("doc_id")).over(sw))
      .where(col("doc_id") === col("__min")).drop("__min")
      .pinned(false)
    // old survivors whose hash went untouched are still survivors AND
    // still byte-valid; a reselected (touched-hash) winner is valid iff
    // it was already a survivor under the same hash
    val untouchedSurv = m("survhash").join(touched, Seq("content_hash"), "left_anti")
    val validReselected = m("survhash")
      .join(reselected, Seq("doc_id", "content_hash"), "left_semi")
      .pinned(false)
    val newSurvIds = untouchedSurv
      .unionByName(reselected.select("doc_id", "content_hash"))
    val retired = m("survhash").join(touched, Seq("content_hash"), "left_semi")
      .select("doc_id")
      .join(validReselected.select("doc_id"), Seq("doc_id"), "left_anti")
      .pinned(false)
    val batchSurvhash = reselected.select("doc_id", "content_hash")
      .join(validReselected.select("doc_id"), Seq("doc_id"), "left_anti")
      .pinned(false)
    // batch bodies: from the feed where present; promoted ids fetch from
    // the corpus
    val promoted = batchSurvhash.select("doc_id")
      .join(deltaDocs.select("doc_id"), Seq("doc_id"), "left_anti")
    val batchDocs = deltaDocs
      .join(batchSurvhash.select("doc_id"), Seq("doc_id"), "left_semi")
      .unionByName(corpus.select(DocCols.map(col): _*)
        .join(promoted, Seq("doc_id"), "left_semi"))
      .pinned(false)
    val verdict = advanceText(spark, dir, m,
      survProj = newSurvIds,
      batchDocs = batchDocs,
      retired = retired,
      departed = departed,
      batchSurvhash = batchSurvhash.select("doc_id", "content_hash"),
      logDelta = deltaLog,
      livelog = livelog,
      fullSurvhash = newSurvIds.select("doc_id", "content_hash"))
    publishDir.foreach(d => PipelineOps.publishVerdictTable(spark, d, verdict))
    verdict
  }

  /** The CDC audit ([[bumpTextCdc]]'s trust-but-verify), two directions,
    * each anti-joining a deterministic 1-in-`mod` SAMPLE against the FULL
    * other side (so the two samples need not agree, and total text hashed
    * per bump stays ~2/mod of the corpus):
    *
    *   1. corpus → log (missed add, changed doc never delivered): a
    *      sample of the corpus keyed on (source, doc_id) must appear
    *      verbatim — same (doc_id, content_hash) — in the post-bump live
    *      log. STRATIFYING the sample key by source gives a bug confined
    *      to a small source (one dropped topic-partition of a 1% feed)
    *      ~n_source/mod trials per bump — the same per-doc detection
    *      density a mass bug gets — where a uniform doc-id sample gave
    *      the whole corpus's 1/mod to every source alike but far fewer
    *      absolute trials to the small one's standing bug.
    *   2. log → corpus (missed removal, stale hash): a uniform doc-id
    *      sample of the live log must appear in the corpus under the
    *      same hash; corpus hashing is restricted to the sampled ids
    *      (a sample-sized semi-join), never the whole corpus text.
    */
  private def auditFeed(livelog: DataFrame, corpus: DataFrame, mod: Long): Unit = {
    val corpusSide =
      if (mod <= 1) corpus
      else corpus.where(
        pmod(hash(col("source"), col("doc_id"), lit(0x5EED)), lit(mod)) === 0)
    val corpusOnly = DedupStream.arrivalLog(corpusSide)
      .join(livelog, Seq("doc_id", "content_hash"), "left_anti")
      .select(col("doc_id"), lit(1L).as("s"))
    val logSide =
      if (mod <= 1) livelog
      else livelog.where(pmod(hash(col("doc_id"), lit(0x5EED)), lit(mod)) === 0)
    val logOnly = logSide
      .join(DedupStream.arrivalLog(
          corpus.join(logSide.select("doc_id"), Seq("doc_id"), "left_semi")),
        Seq("doc_id", "content_hash"), "left_anti")
      .select(col("doc_id"), lit(2L).as("s"))
    val examples = corpusOnly.unionByName(logOnly).limit(5).collect()
    if (examples.nonEmpty) {
      val desc = examples.map(r => s"doc ${r.get(0)} (${
        if (r.getLong(1) == 1L) "in corpus, not in maintained log — missed add/change"
        else "in maintained log, not in corpus — missed removal/stale hash"})")
        .mkString("; ")
      throw new IllegalStateException(
        s"CDC feed/corpus divergence detected by the 1-in-$mod audit — refusing to " +
        s"commit a corrupt bump (run a full bump() to resync): $desc")
    }
  }

  /** Snapshot the folded text state every this many delta commits — the
    * LSM compaction cadence: the read-side fold depth stays ≤ this while
    * the other bumps write O(delta). 8 balances fold depth (8 broadcast
    * anti-join layers under the consuming plan) against amortized write
    * amplification (the corpus-sized gram rewrite lands on 1 bump in 8). */
  private[streaming] val SnapshotEvery = 8

  /** The gram state persists hive-partitioned on its block-key bucket so
    * the next bump's probe partition-prunes the history scan to the
    * delta's buckets ([[graft.pipeline.PipelineOps.pruneGramHistory]]).
    * (The labeled EDGE state deliberately does not get the same layout:
    * its per-bump filter key is the touched components' membership, which
    * in a dup-dense corpus spans the whole bucket space — measured, the
    * partition overhead cost more than the never-firing prune saved.) */
  private val TextPartitions = Map("grams" -> Seq("gbucket"))

  private val TextSnapTables =
    Seq("grams", "pairs", "labels", "survhash", "livelog")
  private val TextDeltaTables = Seq(
    "retired", "departed", "labelsOut", "pairsOut", "labelsIn",
    "grams", "pairs", "survhash", "livelog")

  /** Delta tables that may be ABSENT in chains written by earlier
    * rounds; the fold supplies the legacy fallback (pairsOut ← labelsOut,
    * the pre-split semantics). */
  private val TextOptionalTables = Set("pairsOut")

  /** The folded text state under a bump root — the delta chain's
    * snapshot with every retirement + new-row layer applied, lazily.
    * What a restarted driver (and the canonicality spec) reads. */
  def textState(spark: SparkSession, root: String): Option[Map[String, DataFrame]] =
    loadTextState(spark, textDir(root))

  /** The folded sem state under a bump root (same contract as
    * [[textState]]). */
  def semState(spark: SparkSession, root: String): Option[SemDedupStream.SemState] =
    StateStore.loadChain(spark, semDir(root), Seq("members", "edges"),
        Seq("retired", "cellsOut", "members", "edges"))
      .map { case (snap, ds) => SemDedupStream.foldSemChain(snap, ds) }

  /** Migration shim for gram state persisted BEFORE the `gbucket`
    * physical-layout column existed: the bucket is a pure function of the
    * (lang, source, block) key the rows already carry, so derive it on
    * read. Correctness is identical (the prune filter is lossless either
    * way); the partition prune simply cannot fire against the legacy flat
    * files until the next SnapshotEvery compaction rewrites the state
    * partitioned — the natural migration point, no re-ingest needed. */
  private def withGbucket(g: DataFrame): DataFrame =
    if (g.columns.contains("gbucket")) g
    else g.withColumn("gbucket", PipelineOps.gramBucketCol)

  /** Migration shim for edge state persisted BEFORE the spanning-forest
    * certificate ([[IncrementalCc]]'s `in_forest` flag): no flag means no
    * coverage, which the classifier reads as "cannot certify — rebuild"
    * (the exact pre-certificate behavior), and each touched component
    * regrows its forest as it is rebuilt. Correct from the first bump,
    * no re-ingest. */
  private def withInForest(p: DataFrame): DataFrame =
    if (p.columns.contains("in_forest")) p
    else p.withColumn("in_forest", lit(false))

  /** The folded text state: the chain's snapshot with every delta's
    * retirement + new rows applied, lazily. None before the first bump. */
  private def loadTextState(
      spark: SparkSession, dir: String): Option[Map[String, DataFrame]] =
    StateStore.loadChain(spark, dir, TextSnapTables, TextDeltaTables,
        TextOptionalTables)
      .map { case (snap, deltas) => DedupStream.foldPairChain(
        snap + ("grams" -> withGbucket(snap("grams")),
                "pairs" -> withInForest(snap("pairs"))),
        deltas.map(d => d + ("grams" -> withGbucket(d("grams")),
                             "pairs" -> withInForest(d("pairs"))))) }

  /** First-bump text state: one batch ingest, global CC, every edge
    * epoch-stamped; committed as the chain's founding snapshot. */
  private def initialText(
      spark: SparkSession, dir: String,
      newSurv: DataFrame, arrivals: DataFrame): DataFrame = {
    val pd = DedupStream.discoverPairs(newSurv, None)
    val (labels, labeled) = IncrementalCc.initial(pd.newPairs)
    StateStore.save(dir, Map(
      "grams" -> pd.newGrams, "pairs" -> labeled, "labels" -> labels,
      "survhash" -> newSurv.select("doc_id", "content_hash"),
      "livelog" -> arrivals), TextPartitions)
    DedupStream.verdictFromLabels(newSurv, arrivals, labels).pinned(false)
  }

  /** The shared maintenance tail of both bump flavors, once the exact
    * stage has produced the survivor projection and the delta carving:
    * retire + one incremental pair-discovery batch + an [[IncrementalCc]]
    * rebuild of exactly the touched components, committed as one atomic
    * state version — a DELTA version on most bumps, a folded snapshot
    * every [[SnapshotEvery]]th (the LSM cadence; the corpus-sized state
    * rewrite lands on 1 bump in 8, every other write is O(delta +
    * touched components)). The verdict assembles from the maintained
    * labels — never a global CC. */
  private def advanceText(
      spark: SparkSession,
      dir: String,
      m: Map[String, DataFrame],
      survProj: DataFrame,
      batchDocs: DataFrame,
      retired: DataFrame,
      departed: DataFrame,
      batchSurvhash: DataFrame,
      logDelta: DataFrame,
      livelog: DataFrame,
      fullSurvhash: => DataFrame): DataFrame = {
    val pd = DedupStream.discoverPairs(batchDocs,
      Some(m("grams").join(retired, Seq("doc_id"), "left_anti")))
    val ld = IncrementalCc.refresh(m("labels"), m("pairs"), retired, pd.newPairs)
    if (StateStore.chainLength(spark, dir) + 1 >= SnapshotEvery) {
      val out = ld.labelsOut.select(col("node"))
      StateStore.save(dir, Map(
        "grams" -> m("grams").join(retired, Seq("doc_id"), "left_anti")
          .unionByName(pd.newGrams),
        "pairs" -> m("pairs")
          .join(retired.select(col("doc_id").as("doc_a")), Seq("doc_a"), "left_anti")
          .join(retired.select(col("doc_id").as("doc_b")), Seq("doc_b"), "left_anti")
          .join(ld.pairsOut.select(col("node").as("elabel")), Seq("elabel"), "left_anti")
          .unionByName(ld.pairsIn),
        "labels" -> m("labels").join(out, Seq("node"), "left_anti")
          .unionByName(ld.labelsIn),
        "survhash" -> fullSurvhash, "livelog" -> livelog), TextPartitions)
    } else
      StateStore.saveDelta(dir, Map(
        "retired" -> retired, "departed" -> departed,
        "labelsOut" -> ld.labelsOut, "pairsOut" -> ld.pairsOut,
        "labelsIn" -> ld.labelsIn,
        "grams" -> pd.newGrams, "pairs" -> ld.pairsIn,
        "survhash" -> batchSurvhash, "livelog" -> logDelta), TextPartitions)
    val labelsView = m("labels")
      .join(ld.labelsOut.select(col("node")), Seq("node"), "left_anti")
      .unionByName(ld.labelsIn)
    DedupStream.verdictFromLabels(survProj, livelog, labelsView)
      .pinned(false)
  }

  /** Text family: exact-stage survivors of the new snapshot, valid ids =
    * still-a-survivor-with-unchanged-bytes (the carried survivor-hash
    * projection against the new one — hash-sized, no text), then the
    * shared [[advanceText]] tail. First bump (no state) ingests the
    * snapshot as one batch. */
  private def bumpText(spark: SparkSession, dir: String, newDocs: DataFrame): DataFrame = {
    val newSurv = PipelineOps.survivorsOf(newDocs).pinned(false)
    val arrivals = DedupStream.arrivalLog(newDocs).pinned(false)
    loadTextState(spark, dir) match {
      case None => initialText(spark, dir, newSurv, arrivals)
      case Some(m) =>
        val validIds = m("survhash")
          .join(newSurv.select(col("doc_id"), col("content_hash").as("h2")), "doc_id")
          .where(col("content_hash") === col("h2"))
          .select("doc_id")
        val retired = m("survhash").select("doc_id")
          .join(validIds, Seq("doc_id"), "left_anti").pinned(false)
        val batch = newSurv.join(validIds, Seq("doc_id"), "left_anti")
        // livelog delta/departures by (id, hash) comparison against the
        // carried log: corpus-hash-sized joins, delta-sized writes
        val logKey = Seq("doc_id", "content_hash")
        advanceText(spark, dir, m,
          survProj = newSurv,
          batchDocs = batch,
          retired = retired,
          departed = m("livelog").join(arrivals, logKey, "left_anti")
            .select("doc_id").pinned(false),
          batchSurvhash = batch.select("doc_id", "content_hash"),
          logDelta = arrivals.join(m("livelog"), logKey, "left_anti"),
          livelog = arrivals,
          fullSurvhash = newSurv.select("doc_id", "content_hash"))
    }
  }

  /** Vector family: retire departures (reopened-cell rebuild included),
    * refresh arrivals against the frozen seeds — the refresh's
    * membership anti-join makes passing the whole snapshot as the batch
    * both correct and replay-idempotent. Persists the same LSM cadence
    * as the text family: the corpus-sized (vec_id, cid, q, nrm)
    * membership — quantized vectors and all — rewrites on 1 bump in
    * [[SnapshotEvery]]; every other commit writes the delta alone
    * (departures, reopened cells + their rebuilt pair sets, the batch's
    * assignments and new edges). */
  private def bumpSem(spark: SparkSession, dir: String, vs: VectorSnapshot): DataFrame = {
    val snapNames = Seq("members", "edges")
    val deltaNames = Seq("retired", "cellsOut", "members", "edges")
    val st = StateStore.loadChain(spark, dir, snapNames, deltaNames)
      .map { case (snap, ds) => SemDedupStream.foldSemChain(snap, ds) } match {
      case None =>
        val (st, _) = SemDedupStream.refreshDelta(
          vs.cents, vs.vecs, None, vs.maxCell, vs.threshold)
        StateStore.save(dir, Map("members" -> st.members, "edges" -> st.edges))
        st
      case Some(m) =>
        val retired = m.members.select("vec_id")
          .join(vs.vecs.select("vec_id"), Seq("vec_id"), "left_anti")
          .pinned(false)
        val (prior, reopened, rebuilt) =
          SemDedupStream.retire(m, retired, vs.maxCell, vs.threshold)
        val (st, sd) = SemDedupStream.refreshDelta(
          vs.cents, vs.vecs, Some(prior), vs.maxCell, vs.threshold)
        if (StateStore.chainLength(spark, dir) + 1 >= SnapshotEvery)
          StateStore.save(dir, Map("members" -> st.members, "edges" -> st.edges))
        else
          StateStore.saveDelta(dir, Map(
            "retired" -> retired, "cellsOut" -> reopened,
            "members" -> sd.membersIn,
            "edges" -> rebuilt.unionByName(sd.edgesIn)))
        st
    }
    SemDedupStream.verdict(vs.vecs.select("vec_id"), st, vs.maxCell).pinned(false)
  }

  /** Index family: first bump builds; later bumps reconcile the index's
    * PHYSICAL id set (every assignment row, tombstoned or not) against
    * the snapshot: ids never indexed encode through the frozen quantizer
    * into a fresh immutable segment, and the tombstone relation is
    * REDERIVED as physical-minus-snapshot. Deriving tombstones from
    * (physical, snapshot) alone — rather than folding deltas into the
    * previous tombstone set — is what makes a departed-then-restored
    * vector resurrect for free (embeddings are immutable per vec_id, so
    * its existing rows are still valid; it simply drops out of the
    * tombstone set) instead of being re-appended into a duplicate row
    * while its tombstone still masks both; it is also what makes a
    * replayed bump a no-op (the arrivals anti-join sees the committed
    * manifest's physical set and comes back empty).
    *
    * The bump commits through [[AnnIndexStore]]'s versioned segment
    * manifest — segment + tombstones + manifest become visible in ONE
    * `_COMMITTED` marker create, so a crash mid-bump can never expose a
    * mixed index (the pre-store layout's append-then-overwrite window),
    * concurrent readers only ever see complete committed versions, and
    * two racing bumpers claim distinct versions instead of
    * double-appending into a shared file. Compaction (tombstone ratio
    * over [[PipelineOps.CompactTombstoneRatio]]) folds the live rows +
    * this bump's arrivals into ONE merged segment referenced by the new
    * version — a segment write and a manifest swap, never an in-place
    * rewrite. No eager checkpoints anywhere: every read below is against
    * immutable segment files. */
  private def bumpIndex(spark: SparkSession, idx: String, vecs: DataFrame): Unit = {
    import graft.pipeline.{AnnIndexStore, ArtifactStore}
    def writeSegFrom(assigned: DataFrame, codes: DataFrame)(v: Long, segDir: String): Unit = {
      assigned.write.mode("overwrite").parquet(s"$segDir/ivf_assign.parquet")
      codes.write.mode("overwrite").parquet(s"$segDir/pq_codes.parquet")
    }
    AnnIndexStore.current(spark, idx) match {
      case None if ArtifactStore.exists(spark, s"$idx/ivf_assign.parquet") =>
        // migration shim: a pre-segment-store bump tree (flat assign/
        // codes/tombstones at the root). Without it, current() = None
        // read as "first build" would re-derive the frozen quantizer from
        // the NEW snapshot — a different corpus basis — while the stale
        // flat files lingered under the root. Fold the flat files into
        // the store as the founding segment + mask (the root quantizer
        // files are layout-invariant and stay put), drop the flat copies,
        // then bump normally against the committed version.
        val a = spark.read.parquet(s"$idx/ivf_assign.parquet").pinned(false)
        val c = spark.read.parquet(s"$idx/pq_codes.parquet").pinned(false)
        val tomb =
          if (ArtifactStore.exists(spark, s"$idx/tombstones.parquet"))
            spark.read.parquet(s"$idx/tombstones.parquet")
              .select("vec_id").pinned(false)
          else a.select(col("nbr_id").as("vec_id")).limit(0)
        AnnIndexStore.commit(spark, idx, tomb,
          segsOf = v => Seq(AnnIndexStore.segNameOf(v)),
          writeSeg = Some(writeSegFrom(a, c)))
        Seq("ivf_assign.parquet", "pq_codes.parquet", "tombstones.parquet")
          .foreach(f => ArtifactStore.delete(spark, s"$idx/$f"))
        bumpIndex(spark, idx, vecs)
      case None =>
        val n = vecs.pinned(false)
        PipelineOps.writeAnnQuantizer(n, idx)
        val (assigned, codes) = PipelineOps.encodeAnnBatch(spark, n, idx)
        AnnIndexStore.commit(spark, idx, n.select("vec_id").limit(0),
          segsOf = v => Seq(AnnIndexStore.segNameOf(v)),
          writeSeg = Some(writeSegFrom(assigned, codes)))
      case Some((_, segs)) =>
        val physical = AnnIndexStore.segAssigned(spark, idx, segs)
          .select(col("nbr_id").as("vec_id")).pinned(false)
        val arrivals = vecs.join(physical, Seq("vec_id"), "left_anti")
          .pinned(false)
        val tomb = physical.join(vecs.select("vec_id"), Seq("vec_id"), "left_anti")
          .pinned(false)
        val (nTomb, nArrivals, nPhysical) =
          (tomb.count(), arrivals.count(), physical.count())
        val nLive = nPhysical - nTomb + nArrivals
        if (nTomb.toDouble >= PipelineOps.CompactTombstoneRatio * nLive) {
          val tombN = tomb.select(col("vec_id").as("nbr_id"))
          val (aEnc, cEnc) = PipelineOps.encodeAnnBatch(spark, arrivals, idx)
          val mergedA = AnnIndexStore.segAssigned(spark, idx, segs)
            .join(tombN, Seq("nbr_id"), "left_anti").unionByName(aEnc)
          val mergedC = AnnIndexStore.segCodes(spark, idx, segs)
            .join(tombN, Seq("nbr_id"), "left_anti").unionByName(cEnc)
          AnnIndexStore.commit(spark, idx, tomb.limit(0),
            segsOf = v => Seq(AnnIndexStore.segNameOf(v)),
            writeSeg = Some(writeSegFrom(mergedA, mergedC)))
        } else if (nArrivals > 0) {
          val (aEnc, cEnc) = PipelineOps.encodeAnnBatch(spark, arrivals, idx)
          AnnIndexStore.commit(spark, idx, tomb,
            segsOf = v => segs :+ AnnIndexStore.segNameOf(v),
            writeSeg = Some(writeSegFrom(aEnc, cEnc)))
        } else
          AnnIndexStore.commit(spark, idx, tomb, segsOf = _ => segs)
    }
  }
}
