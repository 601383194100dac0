package graft.plan

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core._

/** Pre-aggregated summary tables — the OLAP "aggregate table" optimization.
  *
  * At 100 TB the fact scan dominates every query; most dashboard traffic
  * drills well above the fact grain. Materializing one summary at a chosen
  * grain (plus its functionally-dependent ancestor columns via `parents`)
  * turns those queries into scans of a dim-cardinality parquet — typically
  * GBs, often KBs — while queries the summary can't answer fall through to
  * the base fact untouched.
  *
  * The reference has no equivalent (its deployments pre-aggregate by hand
  * into the fact table it points at); this makes that practice an engine
  * feature: the summary is itself a cube (grain + ancestor levels become
  * degenerate levels on the summary table; measures re-aggregate their
  * partials), so the ENTIRE query surface — cuts, filters, top-k, sort,
  * growth — works against it through the unchanged [[CubePlanner]].
  *
  * Only losslessly re-aggregable measures ride the summary: sum→sum,
  * count→sum, min→min, max→max. Everything else (median, MOE, custom
  * templates, weighted forms) routes to the base fact. Determinism note: a
  * sum-of-partial-sums has the same float-ordering profile as the base
  * cube's direct sum — deployments needing byte-stable doubles should back
  * such measures with DECIMAL columns, exactly as at the base grain.
  */
object Preagg {

  /** The partial-combining aggregator for a base aggregator, when lossless. */
  def reAggregator(a: Aggregator): Option[Aggregator] = a match {
    case Aggregator.Sum   => Some(Aggregator.Sum)
    case Aggregator.Count => Some(Aggregator.Sum) // partial counts re-add
    case Aggregator.Min   => Some(Aggregator.Min)
    case Aggregator.Max   => Some(Aggregator.Max)
    // distinct counts pre-aggregate ONLY in sketch form: the summary stores
    // the KMV sketch array, rollups merge sketches (lossless union) and
    // estimate — exact COUNT(DISTINCT) could never ride a summary
    case Aggregator.ApproxDistinct(k) => Some(Aggregator.KmvSketchMerge(k))
    case _                => None
  }

  /** What the summary column stores for a measure (differs from the
    * query-time output only for sketches). */
  private def storeAggregator(a: Aggregator): Aggregator = a match {
    case Aggregator.ApproxDistinct(k) => Aggregator.KmvSketchBuild(k)
    case other => other
  }

  def eligibleMeasures(cube: Cube): Seq[Measure] =
    cube.measures.filter(m => reAggregator(m.aggregator).isDefined)

  /** The summary frame at `grain` in STORE schema (grain + ancestor header
    * columns via `parents=true`, measures in their storage form — sketch
    * arrays, not estimates). This is both the one-shot materialization body
    * and the per-chunk partial of the streamed refresh: a chunk's summary
    * frame IS its partial aggregate, and [[mergeSummaries]] folds chunks
    * under the same re-agg algebra rollup queries use. */
  def summaryFrame(
      spark: SparkSession,
      planner: CubePlanner,
      cube: Cube,
      grain: Seq[LevelName]): DataFrame = {
    val meas = eligibleMeasures(cube)
    if (meas.isEmpty) throw PlanError(s"cube '${cube.name}' has no pre-aggregable measures")
    // sketch measures store their raw sketch array, not the estimate —
    // plan through a cube variant whose aggregators are the storage forms
    val storeCube = cube.copy(measures =
      cube.measures.map(m => m.copy(aggregator = storeAggregator(m.aggregator))))
    planner.withCube(storeCube).plan(spark, CubeQuery(
      drilldowns = grain.map(Drilldown(_)),
      parents = true,
      measures = meas.map(m => MeasureName(m.name))))
  }

  /** Computes and writes the summary at `grain` (one parquet per grain).
    * `parents=true` carries every ancestor level, so any rollup at or above
    * the grain resolves without re-joining dims. */
  def materialize(
      spark: SparkSession,
      planner: CubePlanner,
      cube: Cube,
      grain: Seq[LevelName],
      path: String): Unit =
    summaryFrame(spark, planner, cube, grain).write.mode("overwrite").parquet(path)

  /** Keyed combine of two summary frames (store schema) under the cube's
    * re-agg algebra — sums/counts add, min/min, max/max, KMV sketches
    * union (lossless). Keys are every non-measure column, i.e. the grain +
    * ancestor headers, so merging a new chunk's [[summaryFrame]] into the
    * store is one hash aggregation over store + chunk — O(store + chunk),
    * never a fact rescan. This is the streaming maintenance algebra:
    * [[graft.streaming.SummaryRefresh]] folds micro-batches with it and
    * the result is bit-identical to one-shot [[materialize]] for every
    * measure whose partials combine losslessly (integer-valued sums,
    * counts, min/max, sketch union). */
  def mergeSummaries(cube: Cube, existing: DataFrame, delta: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, max, min, sum}
    val meas = eligibleMeasures(cube)
    val measNames = meas.map(_.name).toSet
    val keys = existing.columns.filterNot(measNames).toSeq
    val aggs = meas.map { m =>
      val c = col(s"`${m.name}`")
      (m.aggregator match {
        case Aggregator.Sum | Aggregator.Count => sum(c)
        case Aggregator.Min                    => min(c)
        case Aggregator.Max                    => max(c)
        case Aggregator.ApproxDistinct(k)      => graft.functions.KmvSketch.mergeCol(c, k)
        case other => throw PlanError(s"measure '${m.name}': aggregator $other is not re-aggregable")
      }).as(m.name)
    }
    existing.unionByName(delta)
      .groupBy(keys.map(k => col(s"`$k`")): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** The summary-as-a-cube: grain + ancestor levels become degenerate levels
    * whose key/name columns are the summary's own header columns; measures
    * re-aggregate partials under their original names. */
  def derivedCube(cube: Cube, grain: Seq[LevelName], summaryTable: TableDef): Cube = {
    val dims = grain.map { ln =>
      val (dim, hier, idx) = cube.findLevel(ln)
        .getOrElse(throw PlanError(s"grain level '$ln' not in cube '${cube.name}'"))
      val levels = hier.levels.take(idx + 1).map { l =>
        val named = l.nameColumn.isDefined
        Level(
          name = l.name,
          keyColumn = if (named) s"${l.name} ID" else l.name,
          nameColumn = if (named) Some(l.name) else None,
          keyType = l.keyType)
      }
      Dimension(dim.name, foreignKey = None,
        hierarchies = Seq(Hierarchy(hier.name, primaryKey = levels.last.keyColumn, levels = levels)),
        dimType = dim.dimType)
    }
    val meas = eligibleMeasures(cube).map(m =>
      Measure(m.name, column = m.name, aggregator = reAggregator(m.aggregator).get))
    Cube(s"${cube.name}_preagg", summaryTable, dims, meas)
  }
}

/** Routes each query to the first summary that resolves it — drills/cuts on
  * grain-or-ancestor levels, re-aggregable measures only — and to the base
  * fact otherwise. Resolution IS the eligibility test: a derived cube
  * simply doesn't contain the levels/measures its summary can't serve, so
  * planning against it fails fast with [[PlanError]] and the query falls
  * through (same contract as the reference's hand-built aggregate tables,
  * minus the hand). Order summaries smallest-first so the cheapest
  * eligible one wins. */
final class PreaggPlanner(base: CubePlanner, summaries: Seq[CubePlanner]) {
  def this(base: CubePlanner, summary: CubePlanner) = this(base, Seq(summary))

  def plan(spark: SparkSession, q: CubeQuery): DataFrame = {
    for (s <- summaries)
      try return s.plan(spark, q)
      catch { case _: PlanError => () }
    base.plan(spark, q)
  }
}
