package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.PipelineOps

/** Incremental connected-components maintenance for the ingest-bump dedup
  * state — the piece that turns the per-bump verdict from O(all edges)
  * into O(touched components + delta).
  *
  * The CdcMarginalProbe decomposition showed the global CC pass
  * dominating the text marginal (5.2 of 11.9 s at the 10× fixture, and
  * growing with the corpus: the edge set is corpus-dup-density-sized).
  * But a bump only disturbs the components that lost a node or gained an
  * edge; everything else keeps its label (= component min) verbatim. So
  * the state carries a `labels` (node, label) table plus an epoch label
  * `elabel` column on every edge row, and each bump rebuilds exactly the
  * TOUCHED components:
  *
  *   1. touched = retired ids ∪ new-edge endpoints (delta-sized);
  *   2. A = current labels of touched nodes (one labels scan against a
  *      broadcast key set → a component-count-sized set);
  *   3. AL = every node whose label ∈ A (one labels scan, broadcast
  *      filter) — the affected components' full membership;
  *   4. affected edges = edge rows with elabel ∈ AL (one edge-state scan,
  *      broadcast filter — NO join against a node-sized table, which is
  *      what the elabel column exists to avoid), minus retired endpoints;
  *   5. one SMALL connected-components over (affected edges ∪ new edges)
  *      — touched-components + delta sized, which in practice takes
  *      [[PipelineOps.connectedComponents]]'s driver union-find tail;
  *   6. emit: labelsOut = AL (every previously-affected membership row
  *      and every stale edge epoch, retired in the fold), labelsIn = the
  *      rebuilt labels, pairsIn = the surviving affected edges ∪ new
  *      edges re-stamped with their fresh component label.
  *
  * THE ELABEL INVARIANT: every edge row's elabel is a node of the edge's
  * current component. It holds inductively — every touched component
  * (split by retirement or merged by a new edge alike) is rebuilt whole
  * with freshly-stamped rows, and untouched components are untouched —
  * and it is what makes step 4 a broadcast filter instead of an
  * edges⋈labels shuffle join: because the invariant held BEFORE the
  * bump, AL (current membership of the touched components) provably
  * covers every stale epoch value among their edge rows.
  *
  * Worst case: a bump touching a giant component rebuilds that whole
  * component — the standard incremental-connectivity cost model
  * (deletions force it: a retired node may be a cut vertex). Unaffected
  * components are never read, relabeled, or rewritten. */
object IncrementalCc {

  /** The rebuild's delta payload, in fold order: drop every labels row
    * and edge epoch in `labelsOut`, then union `labelsIn`/`pairsIn`. */
  final case class LabelDelta(
      labelsOut: DataFrame, labelsIn: DataFrame, pairsIn: DataFrame)

  /** Rebuild the touched components. `labels` (node, label) and
    * `labeledPairs` (doc_a, doc_b, elabel) are the folded state;
    * `retiredIds` (doc_id) and `newPairs` (doc_a, doc_b) are delta-sized.
    * All outputs are localCheckpoint-pinned (they are touched-size, and
    * each feeds both the state write and the verdict). */
  def refresh(
      labels: DataFrame,
      labeledPairs: DataFrame,
      retiredIds: DataFrame,
      newPairs: DataFrame): LabelDelta = {
    val touched = retiredIds.select(col("doc_id").as("node"))
      .unionByName(newPairs.select(col("doc_a").as("node")))
      .unionByName(newPairs.select(col("doc_b").as("node")))
      .distinct()
    val a = labels.join(touched, Seq("node"), "left_semi")
      .select(col("label")).distinct()
    val al = labels.join(a, Seq("label"), "left_semi")
      .select(col("node"), col("label")).localCheckpoint(false)
    val alNodes = al.select(col("node"))
    val affEdges = labeledPairs
      .join(alNodes.select(col("node").as("elabel")), Seq("elabel"), "left_semi")
      .select(col("doc_a"), col("doc_b"))
      .join(retiredIds.select(col("doc_id").as("doc_a")), Seq("doc_a"), "left_anti")
      .join(retiredIds.select(col("doc_id").as("doc_b")), Seq("doc_b"), "left_anti")
    val localEdges = affEdges.unionByName(newPairs.select(col("doc_a"), col("doc_b")))
      .distinct().localCheckpoint(false)
    val labelsIn = PipelineOps.connectedComponents(
        localEdges.select(col("doc_a"), col("doc_b")))
      .select(col("node"), col("label")).localCheckpoint(false)
    val pairsIn = localEdges
      .join(labelsIn.select(col("node").as("doc_a"), col("label").as("elabel")), "doc_a")
      .select(col("doc_a"), col("doc_b"), col("elabel")).localCheckpoint(false)
    LabelDelta(alNodes.localCheckpoint(false), labelsIn, pairsIn)
  }

  /** From-scratch labels + epoch-stamped edges (the first bump / a
    * snapshot rebuild): labels = one global CC, every edge stamped with
    * its component label. */
  def initial(pairs: DataFrame): (DataFrame, DataFrame) = {
    val labels = PipelineOps.connectedComponents(
      pairs.select(col("doc_a"), col("doc_b")))
    val labeled = pairs
      .join(labels.select(col("node").as("doc_a"), col("label").as("elabel")), "doc_a")
      .select(col("doc_a"), col("doc_b"), col("elabel"))
    (labels, labeled)
  }
}
