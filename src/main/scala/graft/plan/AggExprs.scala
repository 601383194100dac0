package graft.plan

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.core._

/** Aggregator → Catalyst expression factories.
  *
  * Single-pass (exact) forms are used everywhere except when a
  * BasicGroupedMedian forces the reference's explicit two-pass scheme
  * (tesseract-clickhouse/src/sql/aggregator.rs:28-223). Catalyst's
  * HashAggregate already performs partial/final aggregation physically, so
  * the reference's pass-1-at-fact-grain exists only as the hidden-drilldown
  * staging here.
  */
object AggExprs {

  /** Guarded expression for the `custom` aggregator template: `{}` is the
    * measure column. The reference string-splices raw SQL
    * (aggregator.rs:94-97); we parse with Catalyst after an allow-list check
    * so no untrusted SQL can smuggle in subqueries or side effects. */
  def customExpr(template: String, colName: String): Column = {
    val ok = template.forall(c =>
      c.isLetterOrDigit || " _{}()*/+-.,".contains(c))
    require(ok, s"custom aggregator template contains disallowed characters: $template")
    require(!template.toLowerCase.matches(".*\\b(select|from|join|union)\\b.*"),
      s"custom aggregator template may not embed SQL clauses: $template")
    expr(template.replace("{}", s"`$colName`"))
  }

  private def c(name: String): Column = col(s"`$name`")

  /** 48-bit md5-derived hash of a column's string form — the engine-neutral
    * hash every dedup/sketch op shares (pipeline.Hashing convention). */
  private def hash48(colName: String): Column =
    expr(s"CAST(conv(substr(md5(cast(`$colName` as string)), 1, 12), 16, 10) AS BIGINT)")

  /** Exact single-pass aggregation expression for one measure. */
  def single(m: Measure): Column = {
    val v = c(m.column)
    m.aggregator match {
      case Aggregator.Sum   => sum(v)
      case Aggregator.Count => count(v)
      case Aggregator.Avg   => avg(v)
      case Aggregator.Max   => max(v)
      case Aggregator.Min   => min(v)
      // Weighted/MOE forms sum FIRST and divide/sqrt AFTER, with explicit
      // casts to double at the division points: over DECIMAL input columns
      // the sums are exact (associative — hash-stable under any partition
      // order) and the final double ops are IEEE-deterministic. Over double
      // columns the casts are no-ops.
      case Aggregator.WeightedSum(w) => sum(v * c(w)).cast("double")
      case Aggregator.WeightedAvg(w) =>
        try_divide(sum(v * c(w)).cast("double"), sum(c(w)).cast("double"))
      // cv*sqrt(Σ(v/cv)²) ≡ cv*sqrt(Σv² / cv²): summing squares before the
      // cv division keeps the sum exact for integer/decimal-valued columns
      case Aggregator.Moe(cv) =>
        lit(cv) * sqrt(sum(v * v).cast("double") / lit(cv * cv))
      // squares via d*d, not pow(d,2): JVM Math.pow and libm pow are not
      // guaranteed ULP-identical, IEEE multiplication is
      case Aggregator.ReplicateWeightMoe(cv, df, secs) =>
        val terms = secs.map { s =>
          val d = (sum(v) - sum(c(s))).cast("double"); d * d
        }.reduce(_ + _)
        lit(cv) * sqrt(lit(df / secs.length) * terms)
      case Aggregator.WeightedAverageMoe(cv, df, pw, sws) =>
        val pAvg = try_divide(sum(v * c(pw)).cast("double"), sum(c(pw)).cast("double"))
        val terms = sws.map { s =>
          val d = pAvg - try_divide(sum(v * c(s)).cast("double"), sum(c(s)).cast("double")); d * d
        }.reduce(_ + _)
        lit(cv) * sqrt(lit(df / sws.length) * terms)
      case Aggregator.Custom(t) => customExpr(t, m.column)
      // mergeable KMV sketch → unbiased estimate; hashes are the engine's
      // 48-bit md5 ints so the whole chain is deterministic (p29 proves the
      // relational twin byte-exact vs DuckDB)
      case Aggregator.ApproxDistinct(k) =>
        graft.functions.KmvSketch.estimate(
          graft.functions.KmvSketch.buildCol(hash48(m.column), k), k)
      // internal pair for summary tables: materialize stores the sketch
      // array; the derived cube merges stored sketches and estimates
      case Aggregator.KmvSketchBuild(k) =>
        graft.functions.KmvSketch.buildCol(hash48(m.column), k)
      case Aggregator.KmvSketchMerge(k) =>
        graft.functions.KmvSketch.estimate(
          graft.functions.KmvSketch.mergeCol(c(m.column), k), k)
      case Aggregator.BasicGroupedMedian(_, _) =>
        throw new IllegalArgumentException(
          "BasicGroupedMedian requires the two-pass path (hidden drilldown)")
    }
  }

  /** Pass 1 (hidden-drilldown grain): named partial aggregates. */
  def pass1(m: Measure, i: Int): Seq[(String, Column)] = {
    val v = c(m.column)
    m.aggregator match {
      case Aggregator.Sum   => Seq(s"__m$i" -> sum(v))
      case Aggregator.Count => Seq(s"__m$i" -> count(v))
      case Aggregator.Avg   => Seq(s"__m$i" -> avg(v))
      case Aggregator.Max   => Seq(s"__m$i" -> max(v))
      case Aggregator.Min   => Seq(s"__m$i" -> min(v))
      case Aggregator.BasicGroupedMedian(groupAgg, _) =>
        val e = groupAgg.toLowerCase match {
          case "sum" => sum(v);   case "count" => count(v)
          case "avg" => avg(v);   case "max"   => max(v)
          case "min" => min(v)
          case other => throw new IllegalArgumentException(s"unsupported group_aggregator '$other'")
        }
        Seq(s"__m$i" -> e)
      case Aggregator.WeightedSum(w) => Seq(s"__m$i" -> sum(v * c(w)))
      case Aggregator.WeightedAvg(w) =>
        Seq(s"__m${i}_num" -> sum(v * c(w)), s"__m${i}_den" -> sum(c(w)))
      case Aggregator.Moe(_) => Seq(s"__m$i" -> sum(v * v))
      case Aggregator.ReplicateWeightMoe(_, _, secs) =>
        (s"__m${i}_p" -> sum(v)) +:
          secs.zipWithIndex.map { case (s, n) => s"__m${i}_s$n" -> sum(c(s)) }
      case Aggregator.WeightedAverageMoe(_, _, pw, sws) =>
        Seq(s"__m${i}_pnum" -> sum(v * c(pw)), s"__m${i}_pden" -> sum(c(pw))) ++
          sws.zipWithIndex.flatMap { case (s, n) =>
            Seq(s"__m${i}_snum$n" -> sum(v * c(s)), s"__m${i}_sden$n" -> sum(c(s)))
          }
      case Aggregator.Custom(t) => Seq(s"__m$i" -> customExpr(t, m.column))
      case Aggregator.ApproxDistinct(k) =>
        Seq(s"__m$i" -> graft.functions.KmvSketch.buildCol(hash48(m.column), k))
      case Aggregator.KmvSketchBuild(k) =>
        Seq(s"__m$i" -> graft.functions.KmvSketch.buildCol(hash48(m.column), k))
      case Aggregator.KmvSketchMerge(k) =>
        Seq(s"__m$i" -> graft.functions.KmvSketch.mergeCol(c(m.column), k))
    }
  }

  /** Pass 2 (final grain): combine the pass-1 partials
    * (aggregator.rs:157-223 semantics; count re-aggregates as sum). */
  def pass2(m: Measure, i: Int): Column = m.aggregator match {
    case Aggregator.Sum   => sum(c(s"__m$i"))
    case Aggregator.Count => sum(c(s"__m$i"))
    case Aggregator.Avg   => avg(c(s"__m$i"))
    case Aggregator.Max   => max(c(s"__m$i"))
    case Aggregator.Min   => min(c(s"__m$i"))
    case Aggregator.BasicGroupedMedian(_, _) => expr(s"median(`__m$i`)")
    case Aggregator.WeightedSum(_) => sum(c(s"__m$i")).cast("double")
    case Aggregator.WeightedAvg(_) =>
      try_divide(sum(c(s"__m${i}_num")).cast("double"), sum(c(s"__m${i}_den")).cast("double"))
    case Aggregator.Moe(cv) =>
      lit(cv) * sqrt(sum(c(s"__m$i")).cast("double") / lit(cv * cv))
    case Aggregator.ReplicateWeightMoe(cv, df, secs) =>
      val terms = secs.indices.map { n =>
        val d = (sum(c(s"__m${i}_p")) - sum(c(s"__m${i}_s$n"))).cast("double"); d * d
      }.reduce(_ + _)
      lit(cv) * sqrt(lit(df / secs.length) * terms)
    case Aggregator.WeightedAverageMoe(cv, df, _, sws) =>
      val pAvg = try_divide(sum(c(s"__m${i}_pnum")).cast("double"), sum(c(s"__m${i}_pden")).cast("double"))
      val terms = sws.indices.map { n =>
        val d = pAvg - try_divide(sum(c(s"__m${i}_snum$n")).cast("double"), sum(c(s"__m${i}_sden$n")).cast("double")); d * d
      }.reduce(_ + _)
      lit(cv) * sqrt(lit(df / sws.length) * terms)
    case Aggregator.Custom(t) => customExpr(t, s"__m$i")
    // sketches union losslessly, so the two-pass result is IDENTICAL to the
    // single-pass one — the property that also makes the measure servable
    // from pre-aggregated summaries
    case Aggregator.ApproxDistinct(k) =>
      graft.functions.KmvSketch.estimate(
        graft.functions.KmvSketch.mergeCol(c(s"__m$i"), k), k)
    case Aggregator.KmvSketchBuild(k) =>
      graft.functions.KmvSketch.mergeCol(c(s"__m$i"), k)
    case Aggregator.KmvSketchMerge(k) =>
      graft.functions.KmvSketch.estimate(
        graft.functions.KmvSketch.mergeCol(c(s"__m$i"), k), k)
  }

  /** Columns of the source relation an aggregator reads. `sourceColumns` is
    * the set of columns actually present on the fact frame: Custom-template
    * identifiers are intersected with it, so function names never leak into
    * the pre-aggregation select and a column that happens to share a function
    * name (e.g. `count`) is still carried. */
  def inputColumns(m: Measure, sourceColumns: Set[String]): Seq[String] = m.aggregator match {
    case Aggregator.WeightedSum(w)                      => Seq(m.column, w)
    case Aggregator.WeightedAvg(w)                      => Seq(m.column, w)
    case Aggregator.ReplicateWeightMoe(_, _, secs)      => m.column +: secs
    case Aggregator.WeightedAverageMoe(_, _, pw, sws)   => (m.column +: pw +: sws)
    case Aggregator.Custom(t)                           =>
      m.column +: "[A-Za-z_][A-Za-z0-9_]*".r.findAllIn(t).toSeq.distinct
        .filter(sourceColumns.contains)
    case _                                              => Seq(m.column)
  }
}
