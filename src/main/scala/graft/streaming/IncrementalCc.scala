package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.PipelineOps
import graft.pipeline.PipelineOps.PinnedFrame

/** Incremental connected-components maintenance for the ingest-bump dedup
  * state — the piece that turns the per-bump verdict from O(all edges)
  * into O(delta + rewritten components), where "rewritten" is now far
  * smaller than "touched".
  *
  * The round-14 decomposition showed the residual super-flat term of the
  * CDC text bump was the touched-component rebuild: DELETION-driven (a
  * 400-doc delta touched components covering 68% of the edge state), and
  * the standard incremental-connectivity cost model says every component
  * that lost a node must re-run connectivity — a retired node MAY be a
  * cut vertex. But almost no retired node actually is one: in a
  * dup-cluster (clique-ish) component nearly every node is removable
  * without disconnecting the rest. So the state now carries a SPANNING
  * FOREST certificate — an `in_forest` flag on the labeled edge rows,
  * maintained so the flagged edges of each component form a spanning tree
  * of its members — and each bump splits the touched components three
  * ways:
  *
  *   - SAFE deletions (the common case): every retired node of the
  *     component is a forest LEAF (forest-degree exactly 1), no forest
  *     edge joins two retired nodes, and no retired node is carried as
  *     an elabel stamp on any edge. Removing such
  *     nodes provably leaves the remaining forest spanning the remaining
  *     members — the component keeps its label, its membership rows, and
  *     its edge rows VERBATIM; only the retired rows leave (the fold's
  *     per-endpoint anti-joins). No connectivity run, no rewrite.
  *   - MERGES (new edges whose endpoints span components / new nodes):
  *     connectivity is decided on the CONTRACTED graph — one node per
  *     current component label or fresh doc id, one edge per new pair —
  *     which is delta-sized, never edge-state-sized. Only MEMBERSHIP
  *     rows relabel to the merged label (min of the contracted group =
  *     min member, preserving the label contract); the components' edge
  *     rows are NOT rewritten — their elabels go stale-but-covered (see
  *     the invariant below) — and one concrete new edge per contracted
  *     forest edge joins the forest, keeping the certificate spanning.
  *   - REBUILDS (a retired node that is over-degree in the forest,
  *     forest-adjacent to another retired node, carried as an elabel
  *     stamp on some edge, or in a component with no forest coverage):
  *     the prior path — one CC over the group's surviving edges plus its
  *     new edges ([[PipelineOps.ccWithForest]], which also regrows the
  *     group's forest when the edge set is within the driver tail
  *     bound), every row restamped to the fresh labels.
  *
  * THE ELABEL INVARIANT: every edge row's elabel is a MEMBER NODE of its
  * current component (the component's label as of the edge's last
  * rewrite — the current label after a rebuild, possibly an older
  * merged-in label otherwise). It holds inductively: rebuilds restamp to
  * current labels; merges keep edges whose stamps are old labels — still
  * members of the merged component; and a deletion that would remove a
  * stamp-carrying node from the membership forces a rebuild (the
  * elabel-hit test). Affected-edge selection for a touched component is
  * therefore a broadcast semi-join of elabel against the component's
  * MEMBERSHIP — never an edges⋈labels shuffle, and never a missed
  * edge.
  *
  * Worst case unchanged: a bump retiring a genuine cut vertex (or a
  * stamp-carrying member) rebuilds that component. What the certificate
  * removes is the old blanket assumption that EVERY deletion might
  * disconnect — and the membership-covered stamps remove the old blanket
  * rewrite of every merged component's edges. */
object IncrementalCc {

  /** The refresh's delta payload, in fold order: drop every labels row
    * whose node is in `labelsOut`, drop every edge row whose elabel is in
    * `pairsOut` OR whose endpoint is retired, then union
    * `labelsIn`/`pairsIn`. `labelsOut` and `pairsOut` differ because a
    * MERGE relabels memberships without touching edges: its members are
    * in labelsOut (their rows re-enter via labelsIn under the merged
    * label) but not in pairsOut (the edges stay, their elabels going
    * stale-but-covered). */
  final case class LabelDelta(
      labelsOut: DataFrame, labelsIn: DataFrame,
      pairsIn: DataFrame, pairsOut: DataFrame)

  private val PairCols = Seq("doc_a", "doc_b", "elabel", "in_forest")

  /** Measurement seam: [[graft.pipeline.CcRefreshDecomp]] installs a
    * forcing/timing wrapper here to split [[refresh]]'s internal pinned
    * stages without replicating the production body (the lock-step
    * discipline TextMarginalDecomp uses, applied via a hook instead of a
    * copy). Production leaves the identity — stages stay lazily pinned
    * and materialize under the caller's actions exactly as before. */
  @volatile private[graft] var stagePin: (String, DataFrame) => DataFrame =
    (_, df) => df
  private implicit class StagePinned(private val df: DataFrame) {
    def spinned(tag: String): DataFrame = stagePin(tag, df.pinned(false))
    /** [[spinned]] dropping the checkpoint's stashed origin constraints —
      * the driver-composed path's pin. Its InSet/alias-heavy plans can
      * stash a constraint referencing a non-output attribute, which kills
      * Spark 4's Union constraint rewrite in the consuming maintained-state
      * folds (see [[org.apache.spark.sql.graft.CheckpointStats
      * .dropConstraints]]); constraints are planning-only, so the
      * truncation boundary sheds them. */
    def spinnedNC(tag: String, eager: Boolean = false): DataFrame = stagePin(tag,
      org.apache.spark.sql.graft.CheckpointStats.dropConstraints(df.pinned(eager)))
  }

  /** Bounded-collect gate shared by the driver-composed path's probes:
    * at most this many retired ids / new-pair rows may reach the driver;
    * past it the distributed body runs. Same bound as the classifier's
    * round-17 InSet probe. */
  private[graft] val DriverBound: Int = 1 << 16

  /** Advance the maintained labels. `labels` (node, label) and
    * `labeledPairs` (doc_a, doc_b, elabel, in_forest) are the folded
    * state; `retiredIds` (doc_id) and `newPairs` (doc_a, doc_b) are
    * delta-sized. All outputs are localCheckpoint-pinned (they are
    * rewrite-size, and each feeds both the state write and the
    * verdict).
    *
    * Round 18: when BOTH delta sides fit the driver bound (the common
    * case — the same limit(bound+1) gate the CC driver tails use) and
    * ids are int64, the whole contraction/classification — cid lookup,
    * contracted CC + forest, group classification, forest-edge picks —
    * runs AS DRIVER CODE over the collected delta, and only the
    * corpus-shaped scans (the touched-edge classifier, two labels scans,
    * the classified-membership checkpoint) stay distributed. The
    * round-16 job census showed the refresh floor was ~80 async
    * broadcast-exchange builds per bump (~65 ms of driver scheduling
    * each, scale-INDEPENDENT): every delta×delta join and every
    * delta-frame checkpoint was its own SQL execution rebuilding its
    * broadcasts. The driver-composed path deletes that class outright —
    * delta-sized frames never exist as plans, so there is nothing to
    * broadcast — while every surviving distributed operation is a single
    * InSet-filtered scan. An over-bound delta (or non-int64 ids, or
    * `spark.conf` `graft.cc.driverRefresh=never` — the test seam) keeps
    * the distributed body verbatim. */
  def refresh(
      labels: DataFrame,
      labeledPairs: DataFrame,
      retiredIds: DataFrame,
      newPairs: DataFrame): LabelDelta = {
    import org.apache.spark.sql.types.LongType
    val spark = labels.sparkSession
    val mode = spark.conf.get("graft.cc.driverRefresh", "auto")
    val longIds =
      Seq("node", "label").forall(c => labels.schema(c).dataType == LongType) &&
      Seq("doc_a", "doc_b", "elabel")
        .forall(c => labeledPairs.schema(c).dataType == LongType) &&
      Seq("doc_a", "doc_b").forall(c => newPairs.schema(c).dataType == LongType)
    // The two delta probes stay SEQUENTIAL deliberately: in the bump
    // composition they are the first actions over the caller's lazy
    // delta pins, whose subtrees overlap (newPairs' discovery anti-joins
    // the retired projection) — racing them from futures materializes
    // the shared pins concurrently and recomputes whole subtrees
    // (measured: production CDC bump 2.5× SLOWER under overlapped
    // probes, while every component phase stayed flat).
    // bounded probe of the retired set (one job): emptiness, the bound
    // check, the InSet values, and the driver-path gate all come from it
    val rProbe = retiredIds.select(col("doc_id").as("node")).distinct()
      .limit(DriverBound + 1).collect().map(_.get(0)).toSeq
    // The state contract (non-null node ids) is enforced here, where it is
    // free — the rows are already on the driver. A NULL in the IN-list
    // poisons every membership probe below (three-valued logic turns each
    // non-match into NULL), so a contract violation must be a loud refresh
    // failure, not silent label-state divergence.
    require(!rProbe.contains(null),
      "IncrementalCc state contract violated: NULL doc_id in the retired set")
    val npProbe: Option[Array[(Long, Long)]] =
      if (mode == "never" || !longIds || rProbe.length > DriverBound) None
      else {
        val rows = newPairs.select(col("doc_a"), col("doc_b"))
          .limit(DriverBound + 1).collect()
        // null-keyed pairs (off-contract) keep the distributed body's
        // join semantics rather than guessing a driver equivalent
        if (rows.length > DriverBound || rows.exists(r => r.isNullAt(0) || r.isNullAt(1))) None
        else Some(rows.map(r => (r.getLong(0), r.getLong(1))))
      }
    npProbe match {
      case Some(np) =>
        refreshDriver(labels, labeledPairs,
          rProbe.map(_.asInstanceOf[Long]).toArray, np)
      case None => refreshDistributed(labels, labeledPairs, retiredIds, newPairs, rProbe)
    }
  }

  /** The driver-composed refresh: delta-sized algebra as plain Scala over
    * the collected delta, corpus-shaped work as three InSet-filtered scans
    * + the classified-membership checkpoint. Exactly [[refreshDistributed]]'s
    * outputs (IncrementalCcFuzzSpec pins row-for-row parity across the
    * fuzz chains). */
  private def refreshDriver(
      labels: DataFrame,
      labeledPairs: DataFrame,
      rVals: Array[Long],
      np: Array[(Long, Long)]): LabelDelta = {
    val spark = labels.sparkSession
    import spark.implicits._
    val rSet = rVals.toSet
    // InSet DIRECTLY, not `isin(vs: _*)`: the In expression carries one
    // Literal child per value, so a bound-sized id list built a 65k-node
    // tree PER PREDICATE and the refresh plans a dozen such predicates —
    // measured 6.6 s of pure analyzer/optimizer time per query at the
    // bound (21 ms as an InSet literal, which the optimizer's OptimizeIn
    // would eventually produce anyway — after paying the tree walks).
    // Execution is identical; ids here are gated int64 so the set is
    // exactly the Catalyst-internal value set.
    def inLongs(c: org.apache.spark.sql.Column, vs: Seq[Long]) =
      if (vs.isEmpty) lit(false)
      else org.apache.spark.sql.graft.ColumnBridge.column(
        org.apache.spark.sql.catalyst.expressions.InSet(
          org.apache.spark.sql.graft.ColumnBridge.expression(c),
          vs.iterator.map(x => x: Any).toSet))
    def inR(c: org.apache.spark.sql.Column) = inLongs(c, rVals.toSeq)
    // the distributed antiR's NULL-keeps spelled the same way (doc ids are
    // non-null by contract; the isNull arm keeps off-contract rows rather
    // than silently dropping them through NOT-IN three-valued logic)
    def antiR(df: DataFrame, c: String): DataFrame =
      if (rVals.isEmpty) df else df.where(col(c).isNull || !inR(col(c)))

    // ---- classify deletion-touched components (ONE edge-state scan) --
    // forest-degree, retired-retired forest adjacency, and elabel stamps
    // as driver maps: a tagged explode computes all three views in one
    // pass where the distributed form kept a checkpoint + three filter
    // subtrees (output is ≤ 3|retired| aggregated rows). Runs OVERLAPPED
    // with the labels lookup below — the two scans touch different state
    // tables and depend only on the already-collected delta.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val clsF: Future[Array[org.apache.spark.sql.Row]] =
      if (rVals.isEmpty) Future.successful(Array.empty)
      else Future {
        labeledPairs
          .where(inR(col("doc_a")) || inR(col("doc_b")) || inR(col("elabel")))
          .select(explode(array(
            struct(when(col("in_forest") && inR(col("doc_a")), col("doc_a")).as("node"),
              lit(1).as("tag")),
            struct(when(col("in_forest") && inR(col("doc_b")), col("doc_b")).as("node"),
              lit(1).as("tag")),
            struct(when(col("in_forest") && inR(col("doc_a")) && inR(col("doc_b")),
              col("doc_a")).as("node"), lit(2).as("tag")),
            struct(when(inR(col("elabel")), col("elabel")).as("node"),
              lit(3).as("tag")))).as("x"))
          .where(col("x.node").isNotNull)
          .groupBy(col("x.node").as("node"), col("x.tag").as("tag"))
          .agg(count(lit(1)).as("c"))
          .collect()
      }

    // ---- memberships of retired + endpoint nodes (ONE labels scan) ---
    // retiredInGraph and the contraction's cid lookup come from the same
    // probe; a retired endpoint re-enters as a FRESH node (no live label)
    val endNodes: Array[Long] = {
      val s = scala.collection.mutable.LinkedHashSet.empty[Long]
      np.foreach { case (a, b) => s += a; s += b }
      s.toArray
    }
    val lookup: Array[Long] = (rVals ++ endNodes).distinct
    val lookupF: Future[Array[org.apache.spark.sql.Row]] =
      if (lookup.isEmpty) Future.successful(Array.empty)
      else Future {
        labels.where(inLongs(col("node"), lookup.toSeq))
          .select(col("node"), col("label")).collect()
      }

    // Drain discipline: await BOTH futures to completion before
    // propagating either failure — awaiting lookupF directly would orphan
    // clsF's in-flight Spark job on an exception, and an orphaned job
    // racing SparkContext teardown is the task-rejected flake.
    val lookupT = Await.result(lookupF.transform(scala.util.Success(_)), Duration.Inf)
    val clsT = Await.result(clsF.transform(scala.util.Success(_)), Duration.Inf)
    val retLabel = scala.collection.mutable.LongMap.empty[Long]
    val liveLabel = scala.collection.mutable.LongMap.empty[Long]
    lookupT.get.foreach { row =>
      val n = row.getLong(0)
      if (rSet(n)) retLabel(n) = row.getLong(1) else liveLabel(n) = row.getLong(1)
    }
    def cidOf(n: Long): Long = liveLabel.getOrElse(n, n)

    val fdeg = scala.collection.mutable.LongMap.empty[Long]
    val adjacent = scala.collection.mutable.Set.empty[Long]
    val elabelHit = scala.collection.mutable.Set.empty[Long]
    clsT.get.foreach { row =>
      val n = row.getLong(0)
      row.getInt(1) match {
        case 1 => fdeg(n) = fdeg.getOrElse(n, 0L) + row.getLong(2)
        case 2 => adjacent += n
        case _ => elabelHit += n
      }
    }

    // ---- contract the delta's new edges over current components ------
    val cEdges: Array[(Long, Long, Long, Long)] =
      np.map { case (a, b) => (a, b, cidOf(a), cidOf(b)) }
    val cInter: Array[(Long, Long)] = cEdges.iterator
      .filter(e => e._3 != e._4)
      .map(e => (math.min(e._3, e._4), math.max(e._3, e._4)))
      .toArray.distinct.sorted
    // min-hooked union-find over ascending canonical edges — the exact
    // ccWithForest driver-tail shape (star forests around minima), so the
    // contracted labels/forest match what the distributed body's
    // ccWithForest(cInter) would produce
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    val cForest = scala.collection.mutable.Set.empty[(Long, Long)]
    cInter.foreach { case (x, y) =>
      parent.getOrElseUpdate(x, x); parent.getOrElseUpdate(y, y)
      val (rx, ry) = (find(x), find(y))
      if (rx != ry) {
        if (rx < ry) parent(ry) = rx else parent(rx) = ry
        cForest += ((x, y))
      }
    }
    def glabelOf(c: Long): Long = if (parent.contains(c)) find(c) else c

    // ---- seed classification (groupOf/cidU/cidFull as driver maps) ---
    val seeds: Array[Long] = (endNodes.map(cidOf) ++ retLabel.values).distinct
    val delLabels: Array[Long] = retLabel.values.toArray.distinct
    // a seed WITNESSED as an existing label by the rows just collected
    // provably has membership rows; only fallback cids (endpoints with no
    // live membership) need the scan below to decide "has membership
    // rows" — the freshness test the distributed body answered through
    // memberCls' distinct labels
    val witnessed: Set[Long] = (liveLabel.values ++ retLabel.values).toSet
    val fallbackSeeds: Array[Long] = seeds.filterNot(witnessed)
    // keptBig counts + fallback label-presence in ONE labels scan
    val nrem = scala.collection.mutable.LongMap.empty[Long]
    val ntot = scala.collection.mutable.LongMap.empty[Long]
    val scanKeys: Array[Long] = (delLabels ++ fallbackSeeds).distinct
    if (scanKeys.nonEmpty)
      labels.where(inLongs(col("label"), scanKeys.toSeq))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("ntot"),
          count(when(
            if (rVals.isEmpty) lit(true) else col("node").isNull || !inR(col("node")),
            lit(1))).as("nrem"))
        .collect().foreach { row =>
          ntot(row.getLong(0)) = row.getLong(1)
          nrem(row.getLong(0)) = row.getLong(2)
        }
    val leaves: Set[Long] = fdeg.iterator.collect { case (n, 1L) => n }.toSet
    // unsafe = not a certified leaf / forest-adjacent to another retired
    // node / carried as an epoch stamp — the same three-way test
    val unsafeNodes: Set[Long] =
      retLabel.keysIterator.filterNot(leaves).toSet ++ adjacent ++ elabelHit
    val keptBig: Set[Long] =
      delLabels.iterator.filter(l => nrem.getOrElse(l, 0L) > 1).toSet
    val collapsed: Array[Long] = delLabels.filterNot(keptBig)
    val rebuildDelLabels: Set[Long] =
      unsafeNodes.iterator.flatMap(retLabel.get).toSet ++ collapsed
    val glabelOfSeed: Map[Long, Long] = seeds.iterator.map(c => c -> glabelOf(c)).toMap
    val groupsByG = seeds.groupBy(glabelOfSeed)
    val rbOfG: Map[Long, Boolean] =
      groupsByG.map { case (g, cs) => g -> cs.exists(rebuildDelLabels) }
    val nOfG: Map[Long, Int] = groupsByG.map { case (g, cs) => g -> cs.length }
    val rebuildCids: Array[Long] = seeds.filter(c => rbOfG(glabelOfSeed(c)))
    val rebuildCidSet: Set[Long] = rebuildCids.toSet
    val mergeSeeds: Array[Long] = seeds.filterNot(rebuildCidSet) // mergeGroupOf
    val mergeSeedSet: Set[Long] = mergeSeeds.toSet
    val mergeLabels: Array[Long] = mergeSeeds.filter(c => nOfG(glabelOfSeed(c)) > 1)

    // ---- memberships of every classified component (ONE labels scan;
    // the rb/mg flags are InSet predicates of the driver-computed
    // classification — no join, no broadcast build)
    // empty branches below are FRESH local relations, never plan-derived
    // `.limit(0)` frames: a limit-0 of `labels` carries labels' attribute
    // ids into unions whose other children reference the same relation,
    // and Union's constraint rewrite trips over the duplicate ids
    // (reproduced on the p71 chain; a LocalRelation has no constraints)
    val memberCls =
      if (seeds.isEmpty)
        Seq.empty[(Long, Long, Int, Int)].toDF("node", "label", "rb", "mg")
      else labels.where(inLongs(col("label"), seeds.toSeq))
        .select(col("node"), col("label"),
          when(inLongs(col("label"), rebuildCids.toSeq), lit(1)).otherwise(lit(0)).as("rb"),
          when(inLongs(col("label"), mergeLabels.toSeq), lit(1)).otherwise(lit(0)).as("mg"))
        // EAGER: three of the commit's overlapped state writes (labelsOut,
        // labelsIn via mgLabels, the pairsOut projection) read this pin;
        // left lazy, the parallel writes race its first materialization
        // and each recomputes the labels scan (the overlapped-actions-
        // over-shared-lazy-pins trap measured at 2.5× on the delta
        // probes). One eager job here makes every consumer a cache read.
        .spinnedNC("member-cls", eager = true)
    val alRebuild = memberCls.where(col("rb") === 1).select(col("node"), col("label"))
    val mergeMembers = memberCls.where(col("mg") === 1).select(col("node"), col("label"))

    // ---- rebuild bucket (short-circuits driver-side: no probe job) ----
    // The rebuild is delta-CLASSIFIED but component-sized; when its edge
    // set fits the CC driver-tail bound (the common case) the whole
    // bucket composes on the driver too: ONE bounded probe collects the
    // surviving old edges (the only corpus-shaped input — the same
    // limit(bound+1) gate ccWithForest's driver tail would run against
    // the same rows), the tail's min-hooked union-find labels them, and
    // labels/edges re-enter as LOCAL relations — no rebuild-edges /
    // rb-labels checkpoints, no rbl/rbForest broadcast builds, and the
    // probe's semi-join materializes the member-cls pin before the
    // commit's parallel writes can race it. An over-bound rebuild (or
    // graft.cc.forestEdgeBound=0, the distributed-forest seam) keeps the
    // round-18 distributed bucket verbatim.
    val (rbLabelsP, rbPairs) =
      if (rebuildCids.isEmpty)
        (Seq.empty[(Long, Long)].toDF("node", "label"),
          Seq.empty[(Long, Long, Long, Boolean)].toDF(PairCols: _*))
      else {
        val rebuildOld = antiR(antiR(labeledPairs
          .join(alRebuild.select(col("node").as("elabel")), Seq("elabel"), "left_semi"),
          "doc_a"), "doc_b")
          .select(col("doc_a"), col("doc_b"))
        val rebuildNewRows: Array[(Long, Long)] = cEdges.iterator
          .filter(e => rebuildCidSet(e._3)).map(e => (e._1, e._2)).toArray
        val bound = math.min(
          sys.props.get("graft.cc.forestEdgeBound").map(_.toLong).getOrElse(1L << 20),
          (Int.MaxValue - 2).toLong)
        val oldProbe: Option[Array[org.apache.spark.sql.Row]] =
          if (bound <= 0) None
          else {
            val rows = rebuildOld.distinct().limit(bound.toInt + 1).collect()
            if (rows.length > bound) None else Some(rows)
          }
        oldProbe match {
          case Some(oldRows) =>
            val allEdges: Array[(Long, Long)] =
              (oldRows.iterator.map(r => (r.getLong(0), r.getLong(1))) ++
                rebuildNewRows.iterator).toArray.distinct
            // ccWithForest's driver tail verbatim: walk edges ascending by
            // (min, max) — clique-ish components come out STAR-shaped
            // around their minimum — through a min-hooked union-find
            val sorted = allEdges.sortBy(e =>
              (math.min(e._1, e._2), math.max(e._1, e._2)))
            val rparent = scala.collection.mutable.LongMap.empty[Long]
            def rfind(x: Long): Long = {
              var r = x
              while (rparent(r) != r) r = rparent(r)
              var c = x
              while (rparent(c) != c) { val nx = rparent(c); rparent(c) = r; c = nx }
              r
            }
            val forest = scala.collection.mutable.Set.empty[(Long, Long)]
            sorted.foreach { case (x, y) =>
              rparent.getOrElseUpdate(x, x); rparent.getOrElseUpdate(y, y)
              if (x != y) {
                val (rx, ry) = (rfind(x), rfind(y))
                if (rx != ry) {
                  if (rx < ry) rparent(ry) = rx else rparent(rx) = ry
                  forest += ((x, y))
                }
              }
            }
            // rbp ≡ rebuildEdges ⋈ labels-on-doc_a ⋈ forest-membership:
            // every node is labeled, so the inner join keeps every edge
            val rblRows = rparent.keys.toArray.sorted.map(n => (n, rfind(n))).toSeq
            val rbpRows = allEdges.toSeq.map { case (a, b) =>
              (a, b, rfind(a), forest((a, b)))
            }
            (rblRows.toDF("node", "label"),
              rbpRows.toDF("doc_a", "doc_b", "elabel", "in_forest"))
          case None =>
            val rebuildNew = rebuildNewRows.toSeq.toDF("doc_a", "doc_b")
            val rebuildEdges = rebuildOld.unionByName(rebuildNew).distinct()
              .spinnedNC("rebuild-edges")
            val (rbLabels, rbForest) = PipelineOps.ccWithForest(rebuildEdges)
            val rbl = rbLabels.spinnedNC("rb-labels")
            val rbp = rebuildEdges
              .join(rbl.select(col("node").as("doc_a"), col("label").as("elabel")), "doc_a")
              .join(rbForest.select(col("doc_a"), col("doc_b"), lit(true).as("in_forest")),
                Seq("doc_a", "doc_b"), "left")
              .select(col("doc_a"), col("doc_b"), col("elabel"),
                coalesce(col("in_forest"), lit(false)).as("in_forest"))
            (rbl, rbp)
        }
      }

    // ---- merge bucket -------------------------------------------------
    // membership relabels join the (delta-sized) cid→glabel map — the one
    // local-relation broadcast the path keeps; everything else about the
    // merge bucket is driver rows
    val mgLabels =
      if (mergeLabels.isEmpty) Seq.empty[(Long, Long)].toDF("node", "label")
      else antiR(mergeMembers, "node")
        .join(broadcast(mergeLabels.map(c => (c, glabelOfSeed(c))).toSeq
          .toDF("label", "glabel")), "label")
        .select(col("node"), col("glabel").as("label"))
    // fresh nodes that actually connected: no membership row (not
    // witnessed as a label AND absent from the presence scan) + appears
    // in the contraction's labeling
    val mgFreshRows: Seq[(Long, Long)] = mergeSeeds.iterator
      .filter(c => !witnessed(c) && ntot.getOrElse(c, 0L) == 0L && parent.contains(c))
      .map(c => (c, glabelOfSeed(c))).toSeq
    // forest-edge pick per contracted pair: the lexicographically first
    // (doc_a, doc_b) — the rk=1 row of the distributed window — flagged
    // once even under duplicate delta rows
    val repOf = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    cEdges.foreach { e =>
      val k = (math.min(e._3, e._4), math.max(e._3, e._4))
      val v = (e._1, e._2)
      repOf.get(k) match {
        case Some(p) if p._1 < v._1 || (p._1 == v._1 && p._2 <= v._2) => ()
        case _ => repOf(k) = v
      }
    }
    val flagged = scala.collection.mutable.Set.empty[(Long, Long)]
    val mgNewRows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Boolean)]
    cEdges.foreach { e =>
      if (mergeSeedSet(e._3)) {
        val k = (math.min(e._3, e._4), math.max(e._3, e._4))
        val isF = e._3 != e._4 && cForest(k) &&
          repOf(k) == ((e._1, e._2)) && flagged.add(k)
        mgNewRows += ((e._1, e._2, glabelOfSeed(e._3), isF))
      }
    }

    val labelsIn = rbLabelsP.select(col("node"), col("label"))
      .unionByName(mgLabels)
      .unionByName(mgFreshRows.toDF("node", "label"))
      .spinnedNC("labels-in")
    val pairsIn = rbPairs
      .unionByName(mgNewRows.toSeq.toDF("doc_a", "doc_b", "elabel", "in_forest"))
      .select(PairCols.map(col): _*).spinnedNC("pairs-in")
    val labelsOut = rVals.toSeq.toDF("node")
      .unionByName(alRebuild.select("node"))
      .unionByName(mergeMembers.select("node"))
      .distinct().spinnedNC("labels-out")
    // not pinned: a bare projection of the already-pinned memberCls
    val pairsOut = alRebuild.select("node")
    LabelDelta(labelsOut, labelsIn, pairsIn, pairsOut)
  }

  /** The distributed refresh body — the over-bound / non-int64 /
    * forced-off path, verbatim the round-17 shape. */
  private def refreshDistributed(
      labels: DataFrame,
      labeledPairs: DataFrame,
      retiredIds: DataFrame,
      newPairs: DataFrame,
      rProbe: Seq[Any]): LabelDelta = {
    val r = retiredIds.select(col("doc_id").as("node")).distinct().spinned("retired")
    val rA = r.select(col("node").as("doc_a"))
    val rB = r.select(col("node").as("doc_b"))

    // ---- classify deletion-touched components ------------------------
    // The classifier needs three views of how retired nodes sit in the
    // edge state: forest-degree, retired-retired forest adjacency, and
    // elabel stamps. A delta-sized retired set collects to an InSet
    // predicate so ONE edge-state scan feeds all three (the predicate is
    // a per-row hash probe — scan-shaped at any corpus size); a delta too
    // large to collect falls back to three broadcast semi-join scans.
    // The collect is bounded by the same limit(bound+1) gate the CC
    // driver tails use: at most 2^16+1 rows ever reach the driver —
    // emptiness, the bound check, and the InSet values all come from the
    // one probe, and an over-bound retired set never materializes here.
    // [[refresh]]'s gate probe already ran that exact collect (and its
    // NULL contract check) — reuse it instead of re-scanning the delta
    // on precisely the path chosen for being expensive.
    val rVals = rProbe
    // Retired-set membership as driver-side predicates (round 17): when
    // the delta fits the driver bound (the common case — the same rows
    // the classifier already collected), every semi/anti join against the
    // tiny pinned r becomes an InSet probe — a per-row hash test with NO
    // broadcast exchange. The joins it replaces each rebuilt their
    // broadcast in EVERY consuming checkpoint's execution (exchange reuse
    // does not span SQL executions; the round-16 job census showed those
    // async builds are the refresh's fixed per-bump floor). The empty
    // delta short-circuits to limit(0)/identity, and an over-bound delta
    // keeps the broadcast-join form. The predicates are EXACT join
    // equivalents even off-contract: a NULL probe never matches a semi
    // build side (IN yields NULL → dropped, same as left_semi) and is
    // KEPT by left_anti — antiR spells that out (`isNull ||`) so NOT-IN's
    // three-valued logic can never silently drop a NULL-keyed row.
    val rSmall = rVals.length <= (1 << 16)
    def inR(c: org.apache.spark.sql.Column) = c.isin(rVals: _*)
    def semiR(df: DataFrame, c: String): DataFrame =
      if (rVals.isEmpty) df.limit(0)
      else if (rSmall) df.where(inR(col(c)))
      else df.join(r.select(col("node").as(c)), Seq(c), "left_semi")
    def antiR(df: DataFrame, c: String): DataFrame =
      if (rVals.isEmpty) df
      else if (rSmall) df.where(col(c).isNull || !inR(col(c)))
      else df.join(r.select(col("node").as(c)), Seq(c), "left_anti")
    val (fdeg, adjacent, elabelHit) =
      if (rVals.isEmpty) {
        val e = r.select(col("node"))
        (e.withColumn("fd", lit(1L)).limit(0), e.limit(0), e.limit(0))
      } else {
        if (rSmall) {
          val touched = labeledPairs
            .where(inR(col("doc_a")) || inR(col("doc_b")) || inR(col("elabel")))
            .spinned("touched")
          val f = touched.where(col("in_forest"))
          (f.where(inR(col("doc_a"))).select(col("doc_a").as("node"))
             .unionByName(f.where(inR(col("doc_b"))).select(col("doc_b").as("node")))
             .groupBy("node").agg(count(lit(1)).as("fd")),
           f.where(inR(col("doc_a")) && inR(col("doc_b")))
             .select(col("doc_a").as("node")),
           touched.where(inR(col("elabel")))
             .select(col("elabel").as("node")).distinct())
        } else {
          val forest = labeledPairs.where(col("in_forest"))
          (forest.join(rA, Seq("doc_a"), "left_semi")
             .select(col("doc_a").as("node"))
             .unionByName(forest.join(rB, Seq("doc_b"), "left_semi")
               .select(col("doc_b").as("node")))
             .groupBy("node").agg(count(lit(1)).as("fd")),
           forest.join(rA, Seq("doc_a"), "left_semi")
             .join(rB, Seq("doc_b"), "left_semi")
             .select(col("doc_a").as("node")),
           labeledPairs
             .join(r.select(col("node").as("elabel")), Seq("elabel"), "left_semi")
             .select(col("elabel").as("node")).distinct())
        }
      }
    val leaves = fdeg.where(col("fd") === 1).select("node")
    val retiredInGraph = semiR(labels, "node").spinned("retired-in-graph")
    // unsafe = not a certified leaf (over-degree, no forest coverage),
    // forest-adjacent to another retired node (removing both could
    // orphan the subtree between them), or carried as an EPOCH STAMP on
    // some edge (elabels are member nodes — the current label always,
    // older merged-in labels too — and dropping a stamped node from
    // labels would uncover those edges from the next bump's
    // affected-edge selection)
    val unsafeNodes = retiredInGraph.select("node")
      .join(leaves, Seq("node"), "left_anti")
      .unionByName(adjacent)
      .unionByName(elabelHit)
    // a deletion-touched component shrunk to ≤1 remaining member has no
    // edges left, and an edge-less survivor must DROP from labels like
    // any isolated node (labels ≡ CC-over-edges is the state contract) —
    // only the rebuild path drops memberships, so route it there
    val delLabels = retiredInGraph.select("label").distinct()
    val keptBig = antiR(labels.join(delLabels, Seq("label"), "left_semi"), "node")
      .groupBy("label").agg(count(lit(1)).as("nrem"))
      .where(col("nrem") > 1).select("label")
    val collapsed = delLabels.join(keptBig, Seq("label"), "left_anti")
    val rebuildDelLabels = labels.join(unsafeNodes.distinct(), Seq("node"), "left_semi")
      .select("label")
      .unionByName(collapsed)
      .distinct()

    // ---- contract the delta's new edges over current components ------
    // a retired node re-entering through new pairs is a FRESH node (its
    // old membership is dead), so the contraction maps through the
    // retired-free labels view
    val liveLabels = antiR(labels, "node")
    val endNodes = newPairs.select(col("doc_a").as("node"))
      .unionByName(newPairs.select(col("doc_b").as("node"))).distinct()
    // right-outer with the DELTA side broadcast: a left-outer from
    // endNodes would have to build (shuffle) the corpus-sized labels
    val cidOf = liveLabels
      .join(broadcast(endNodes), Seq("node"), "right_outer")
      .select(col("node"), coalesce(col("label"), col("node")).as("cid"))
      .spinned("cid-of")
    val cEdges = newPairs
      .join(cidOf.select(col("node").as("doc_a"), col("cid").as("ca")), "doc_a")
      .join(cidOf.select(col("node").as("doc_b"), col("cid").as("cb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("ca"), col("cb"))
      .spinned("c-edges")
    // contracted component per cid (delta-sized CC; self-edges drop out),
    // plus a spanning forest of the contraction so each merge adds
    // exactly the connecting edges to the certificate
    // not pinned: single consumer — ccWithForest's bounded probe collects
    // it once (and the above-bound path truncates lineage itself), so a
    // checkpoint here is one materialization job of pure overhead
    val cInter = cEdges.where(col("ca") =!= col("cb"))
      .select(least(col("ca"), col("cb")).as("ca"), greatest(col("ca"), col("cb")).as("cb"))
      .distinct()
    val (cLabels, cForest) = PipelineOps.ccWithForest(cInter)
    // groupOf: cid -> merged group label (itself when untouched by merges).
    // Seeded with BOTH the new-edge endpoints' cids and every
    // deletion-touched component's label, so a deletion-only component is
    // its own singleton group (and can reach the rebuild bucket below).
    val groupOf = cidOf.select(col("cid"))
      .unionByName(retiredInGraph.select(col("label").as("cid")))
      .distinct()
      .join(cLabels.select(col("node").as("cid"), col("label").as("glabel")), Seq("cid"), "left")
      .select(col("cid"), coalesce(col("glabel"), col("cid")).as("glabel"))

    // ONE classification frame replaces the round-15 groupOf/rebuildGroups
    // /rebuildCids/relabelCids pin chain (four checkpoints, each its own
    // SQL execution with its own broadcast builds — the round-16 job
    // census showed those builds ARE the per-bump fixed floor):
    // cid -> (glabel, n = group size, rb = group contains a component
    // forced to rebuild by an unsafe deletion). Every bucket below is a
    // FILTER of this checkpoint.
    val cidU = groupOf
      .join(rebuildDelLabels.select(col("label").as("cid"), lit(1).as("u"))
        .distinct(), Seq("cid"), "left")
      .select(col("cid"), col("glabel"), coalesce(col("u"), lit(0)).as("u"))
    val cidFull = cidU
      .join(cidU.groupBy("glabel").agg(count(lit(1)).as("n"), max(col("u")).as("rb")),
        Seq("glabel"))
      .select(col("cid"), col("glabel"), col("n"), col("rb"))
      .spinned("cid-full")
    // rebuild group/cid sets: groups containing an unsafe deletion.
    // relabel set: merge groups of ≥2 cids minus the rebuild groups —
    // their edges are NOT touched, elabels go stale-but-covered (still
    // member nodes). No labels-existence filter here: a fresh cid simply
    // matches no membership row in the inner join below, so the old
    // corpus-wide labels.distinct() semi-join bought nothing.
    val rebuildCids = cidFull.where(col("rb") === 1).select("cid")

    // ---- the three buckets -------------------------------------------
    // memberships of every classified component in ONE labels scan (the
    // round-15 shape scanned labels once per bucket): rebuilt components
    // rewrite fully, merged components relabel by contraction alone
    val memberCls = labels
      .join(cidFull.select(col("cid").as("label"), col("n"), col("rb")), "label")
      .select(col("node"), col("label"), col("n"), col("rb"))
      .spinned("member-cls")
    val alRebuild = memberCls.where(col("rb") === 1).select(col("node"), col("label"))
    val mergeMembers = memberCls.where(col("rb") === 0 && col("n") > 1)
      .select(col("node"), col("label"))

    // rebuild bucket: the groups' surviving old edges (selected by
    // MEMBERSHIP as the epoch key — elabels may be any member node) +
    // their new pairs; one CC + fresh forest over real edges. When
    // nothing is unsafe (the common case the certificate exists for)
    // the whole bucket short-circuits — no edge-state scan, no CC.
    val (rbLabelsP, rbPairs) =
      if (rebuildCids.isEmpty)
        (labels.limit(0), labeledPairs.select(PairCols.map(col): _*).limit(0))
      else {
        val rebuildOld = antiR(antiR(labeledPairs
          .join(alRebuild.select(col("node").as("elabel")), Seq("elabel"), "left_semi"),
          "doc_a"), "doc_b")
          .select(col("doc_a"), col("doc_b"))
        val rebuildNew = cEdges
          .join(rebuildCids.select(col("cid").as("ca")), Seq("ca"), "left_semi")
          .select(col("doc_a"), col("doc_b"))
        val rebuildEdges = rebuildOld.unionByName(rebuildNew).distinct().spinned("rebuild-edges")
        val (rbLabels, rbForest) = PipelineOps.ccWithForest(rebuildEdges)
        val rbl = rbLabels.spinned("rb-labels")
        val rbp = rebuildEdges
          .join(rbl.select(col("node").as("doc_a"), col("label").as("elabel")), "doc_a")
          .join(rbForest.select(col("doc_a"), col("doc_b"), lit(true).as("in_forest")),
            Seq("doc_a", "doc_b"), "left")
          .select(col("doc_a"), col("doc_b"), col("elabel"),
            coalesce(col("in_forest"), lit(false)).as("in_forest"))
        (rbl, rbp)
      }

    // merge bucket: relabel MEMBERSHIPS of merged components to the group
    // label by contraction alone — no connectivity over real edges, no
    // edge rewrite. A filter of the pinned classification, not its own pin.
    val mergeGroupOf = cidFull.where(col("rb") === 0).select(col("cid"), col("glabel"))
    // members relabel EXCLUDING retired ones: a changed doc is retired
    // from its old component AND re-enters as a fresh contracted node, so
    // without the anti-join it would earn two labels rows (one here, one
    // from the fresh bucket)
    val mgLabels = antiR(mergeMembers, "node")
      .join(mergeGroupOf.select(col("cid").as("label"), col("glabel")), "label")
      .select(col("node"), col("glabel").as("label"))
    // fresh nodes (cids with no membership row) that actually CONNECTED
    // (appear in the contraction's labeling): label with their group;
    // fresh singletons with only self-pairs never arise (doc_a != doc_b).
    // "Has a membership row" is answered by the classified-members
    // checkpoint — every existing classified cid appears there — instead
    // of the round-15 corpus-wide labels.distinct() shuffle.
    val mgFreshLabels = mergeGroupOf
      .join(memberCls.select(col("label").as("cid")).distinct(), Seq("cid"), "left_anti")
      .join(cLabels.select(col("node").as("cid")), Seq("cid"), "left_semi")
      .select(col("cid").as("node"), col("glabel").as("label"))
    // the delta's non-rebuild new edges: stamped with the group label;
    // in_forest = this edge was chosen by the contraction's forest (one
    // concrete edge per contracted forest edge)
    val cForestPick = cEdges
      .join(cForest.select(
          least(col("ca"), col("cb")).as("ca2"), greatest(col("ca"), col("cb")).as("cb2"),
          lit(true).as("cf")),
        least(col("ca"), col("cb")) === col("ca2") &&
          greatest(col("ca"), col("cb")) === col("cb2"), "left")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(least(col("ca"), col("cb")), greatest(col("ca"), col("cb")))
          .orderBy(col("doc_a"), col("doc_b"))))
      .withColumn("in_forest",
        coalesce(col("cf"), lit(false)) && col("rk") === 1 && col("ca") =!= col("cb"))
    val mgNewPairs = cForestPick
      .join(mergeGroupOf.select(col("cid").as("ca"), col("glabel")), "ca")
      .select(col("doc_a"), col("doc_b"), col("glabel").as("elabel"), col("in_forest"))

    val labelsIn = rbLabelsP.select(col("node"), col("label"))
      .unionByName(mgLabels).unionByName(mgFreshLabels)
      .spinned("labels-in")
    val pairsIn = rbPairs.unionByName(mgNewPairs)
      .select(PairCols.map(col): _*).spinned("pairs-in")
    // labelsOut: every retired node's membership row, plus the rebuilt
    // AND merged components' memberships (re-entering via labelsIn);
    // pairsOut: only the REBUILT memberships — merged components keep
    // their edge rows, stale elabels covered by the retained membership
    val labelsOut = r.unionByName(alRebuild.select("node"))
      .unionByName(mergeMembers.select("node"))
      .distinct().spinned("labels-out")
    // not pinned: a bare projection of the already-pinned alRebuild —
    // every consumer re-reads the checkpoint, never the upstream plan
    val pairsOut = alRebuild.select("node")
    LabelDelta(labelsOut, labelsIn, pairsIn, pairsOut)
  }

  /** From-scratch labels + epoch-stamped, forest-flagged edges (the first
    * bump / a snapshot rebuild): one global CC with forest extraction —
    * labels = component minima, every edge stamped with its component
    * label, the spanning forest flagged at ANY scale (driver union-find
    * within the tail bound, [[PipelineOps.distributedForest]] Borůvka
    * above it — certificate coverage is total either way). */
  def initial(pairs: DataFrame): (DataFrame, DataFrame) = {
    val p = pairs.select(col("doc_a"), col("doc_b"))
    val (labels, forest) = PipelineOps.ccWithForest(p)
    val labeled = p
      .join(labels.select(col("node").as("doc_a"), col("label").as("elabel")), "doc_a")
      .join(forest.select(col("doc_a"), col("doc_b"), lit(true).as("in_forest")),
        Seq("doc_a", "doc_b"), "left")
      .select(col("doc_a"), col("doc_b"), col("elabel"),
        coalesce(col("in_forest"), lit(false)).as("in_forest"))
    (labels, labeled)
  }
}
