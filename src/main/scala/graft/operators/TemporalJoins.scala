package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators a training-data / event pipeline needs that
  * Spark SQL has no native form for: as-of join and interval (range) join.
  * The reference engine has no temporal joins at all (its time features are
  * the growth/rate calculations over pre-aggregated frames) — these are
  * beyond-parity operators, built in the preference order the build brief
  * sets: composed from existing relational ops, no custom physical plan
  * needed, because the compositions below are already the optimal shuffle
  * shapes.
  *
  * Scale design (the reason these are NOT theta-joins):
  *
  *   - A naive as-of join is `a JOIN b ON a.k = b.k AND b.ts <= a.ts` +
  *     keep-latest: Spark plans the non-equi conjunct as a join *filter*,
  *     so each key's rows cross-product before filtering — O(n·m) per key.
  *     [[asofJoin]] instead unions the two sides and takes a running
  *     `last(..., ignoreNulls)` per key in event order: ONE shuffle on the
  *     key, one per-partition sort, zero row expansion. This is the
  *     merge-scan a native as-of operator (pandas merge_asof, kdb aj)
  *     performs, expressed declaratively so Catalyst codegens the pass.
  *
  *   - A naive interval join is `p JOIN i ON p.k = i.k AND p.ts BETWEEN
  *     i.lo AND i.hi` — the same per-key cross-product. [[intervalJoin]]
  *     buckets time into fixed-width cells: an interval replicates to the
  *     cells it covers (span/width + 1 rows — a small constant when the
  *     width is chosen near the max span), a point lands in exactly one
  *     cell, and the join becomes an EQUI-join on (key, cell) that Spark
  *     hash-partitions like any other. Each point meets only intervals
  *     overlapping its cell — never the key's whole history. This is the
  *     standard bucketed range-join strategy (Flink's interval join,
  *     range-join hints in commercial Spark forks) built from public
  *     primitives.
  */
object TemporalJoins {

  private def q(s: String): Column = col(s"`$s`")

  /** As-of join: for each left row, attach the payload of the latest right
    * row with the same keys and `right.ts <= left.ts` (or `<` when
    * `strict`). Right-side payload arrives as one nullable struct column
    * `asofCol` (fields: `ts` plus each payload column) — atomic, so all
    * payload fields come from the SAME matched row even when some payload
    * values are null; no match → the struct is null.
    *
    * Determinism: ties inside one (keys, ts) group resolve by `tieBreak`
    * ascending, larger-last wins (it is the last the running window sees).
    *
    * @param left     probe side; all its columns pass through
    * @param right    build side; only keys ++ ts ++ tieBreak ++ payload read
    * @param keys     equality keys present on both sides
    * @param ts       event-time column name present on both sides (any
    *                 orderable type; integer µs recommended)
    * @param payload  right columns carried in the result struct
    * @param tieBreak right-side ordering columns within equal ts
    * @param strict   true → exclusive (`right.ts < left.ts`)
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      ts: String,
      payload: Seq[String],
      tieBreak: Seq[String] = Nil,
      strict: Boolean = false,
      asofCol: String = "asof"): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one equality key")
    require(!left.columns.contains(asofCol),
      s"left already has a column named '$asofCol'; pass a different asofCol")
    require(!left.columns.contains("__tag") && !right.columns.contains("__tag"),
      "'__tag' is reserved by asofJoin")

    val rSel = right.select(
      ((keys :+ ts).map(q) ++
        tieBreak.filterNot((keys :+ ts).contains).map(q) :+
        struct(q(ts).as("ts") +: payload.map(c => q(c).as(c)): _*).as(asofCol)): _*)
      .withColumn("__tag", lit(0))
    val lSel = left.withColumn("__tag", lit(1))

    // inclusive: right sorts BEFORE left at equal ts (tag 0 < 1) so the
    // left row sees it; strict: left first, so it doesn't
    val tagOrder = if (strict) col("__tag").desc else col("__tag").asc
    val order: Seq[Column] =
      q(ts).asc +: tagOrder +: tieBreak.map(c => q(c).asc_nulls_first)
    val w = Window.partitionBy(keys.map(q): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lSel.unionByName(rSel, allowMissingColumns = true)
      .withColumn(asofCol, last(col(asofCol), ignoreNulls = true).over(w))
      .where(col("__tag") === 1)
      .drop("__tag")
  }

  /** Interval join: inner join of `points` to every `intervals` row with
    * equal keys and `lo <= pt <= hi`. One output row per matching (point,
    * interval) pair; columns are the interval's plus the point's non-key
    * columns. Aggregations that must also see zero-match intervals join
    * the aggregated result back to the interval frame (see the p26 caller).
    *
    * `bucketUs` is the time-cell width: pick it at or above the typical
    * interval span so an interval replicates to span/bucketUs + 1 ≈ 2
    * cells. Wider intervals still join CORRECTLY — they just replicate to
    * more cells — so the width is purely a performance knob, never a
    * correctness contract.
    */
  def intervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      ptCol: String,
      loCol: String,
      hiCol: String,
      bucketUs: Long): DataFrame = {
    require(keys.nonEmpty, "intervalJoin needs at least one equality key")
    require(bucketUs > 0, "bucketUs must be positive")

    // alias-qualified resolution: both sides may share lineage (e.g. two
    // filters of one scan), which trips Spark's ambiguous-self-join check
    // if columns are resolved through the parent frames
    val iCells = intervals.withColumn("__cell",
        explode(sequence(expr(s"`$loCol` DIV $bucketUs"), expr(s"`$hiCol` DIV $bucketUs"))))
      .alias("__iv")
    val pCells = points.withColumn("__cell", expr(s"`$ptCol` DIV $bucketUs"))
      .alias("__pt")

    val joined = iCells.join(pCells,
      keys.map(k => col(s"__iv.`$k`") === col(s"__pt.`$k`")).reduce(_ && _) &&
        col("__iv.__cell") === col("__pt.__cell") &&
        col(s"__pt.`$ptCol`") >= col(s"__iv.`$loCol`") &&
        col(s"__pt.`$ptCol`") <= col(s"__iv.`$hiCol`"))

    val ptOnly = points.columns.filterNot(keys.contains)
    joined.select(
      intervals.columns.map(c => col(s"__iv.`$c`").as(c)) ++
        ptOnly.map(c => col(s"__pt.`$c`").as(c)): _*)
  }
}
