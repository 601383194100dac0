package graft.fuzz

import scala.util.Random
import graft.core._

/** Grammar-driven differential fuzzer: deterministic random compositions of
  * the cube-query grammar (drilldowns × cuts incl. `~`/`*` × measures ×
  * HAVING filters × top/top_where/sort/limit × parents/properties/sparse)
  * over the TpchStar cube, each paired with an independently-rendered ANSI
  * SQL oracle.
  *
  * The reference's names.rs tests (:456-597) enumerate SPELLINGS of each
  * clause but never their compositions, and q01–q50 are hand-picked — this
  * corpus is the compositional coverage. Queries are built from their
  * name-grammar STRING spellings (Drilldown.parse / CutSpec.parse / …), so
  * the parser is inside the fuzz loop, not just the planner.
  *
  * The oracle SQL is deliberately restricted to the dialect intersection of
  * Spark SQL (ANSI mode + `spark.sql.ansi.doubleQuotedIdentifiers=true`)
  * and DuckDB — double-quoted identifiers, `VARCHAR(64)` casts,
  * `LIMIT n OFFSET m`, windowed `row_number()` in a subquery instead of
  * QUALIFY — so the SAME string drives both the in-JVM differential spec
  * (planner vs `spark.sql`) and the driver-style DuckDB cross-check
  * (`graft.FuzzDump` + tools/compare.py).
  *
  * Determinism rules (the cross-engine contract the q-series oracles use):
  * only measures whose aggregation is partial-sum-order-immune — integer
  * -valued double sums, counts, min/max, and DECIMAL sums converted to
  * double once at the end (`d2d`). Every generated ordering is made TOTAL
  * by tiebreaking on all drill headers, so top/limit subsets are unique. */
object QueryFuzzer {

  // ----------------------------------------------------------- level pool

  /** One drilldownable level: its grammar spelling, SQL rendering, valid
    * cut members, and (pool-internal) parent chain. */
  final case class LevelInfo(
      spelling: String,                  // Dim.Level (the 2-part grammar form)
      keyExpr: String,                   // SQL expr of the key column
      keyHeader: String,                 // planner's output header for the key
      name: Option[(String, String)],    // (sql column, header) of the name col
      join: Option[String],              // join-dependency key (GEO/CUST/PART)
      members: Seq[String],              // valid member ids for IN/exclude cuts
      textKey: Boolean,
      parentSpellings: Seq[String] = Nil, // ancestors, outermost first
      likePats: Seq[String] = Nil,        // patterns for `*` match cuts
      props: Seq[(String, String, String)] = Nil) // (prop name, sql col, header)

  private val Geo  = "JOIN supplier ON l_suppkey = s_suppkey JOIN nation ON s_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey"
  private val Cust = "JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey"
  private val Part = "JOIN part ON l_partkey = p_partkey"
  private val joins = Map("GEO" -> Geo, "CUST" -> Cust, "PART" -> Part)

  val levels: Seq[LevelInfo] = Seq(
    LevelInfo("Return Flag.Return Flag", "l_returnflag", "Return Flag", None, None,
      Seq("A", "N", "R"), textKey = true, likePats = Seq("A", "R")),
    LevelInfo("Line Status.Line Status", "l_linestatus", "Line Status", None, None,
      Seq("F", "O"), textKey = true),
    LevelInfo("Ship Date.Year", "year(l_shipdate)", "Year", None, None,
      (1992 to 1998).map(_.toString), textKey = false),
    LevelInfo("Ship Date.Month", "month(l_shipdate)", "Month", None, None,
      (1 to 12).map(_.toString), textKey = false,
      parentSpellings = Seq("Ship Date.Year")),
    LevelInfo("Geography.Region", "r_regionkey", "Region ID", Some(("r_name", "Region")),
      Some("GEO"), (0 to 4).map(_.toString), textKey = false),
    LevelInfo("Geography.Nation", "n_nationkey", "Nation ID", Some(("n_name", "Nation")),
      Some("GEO"), (0 to 24).map(_.toString), textKey = false,
      parentSpellings = Seq("Geography.Region")),
    LevelInfo("Customer.Segment", "c_mktsegment", "Segment", None, Some("CUST"),
      Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"),
      textKey = true, likePats = Seq("IN", "AUTO", "HOLD")),
    LevelInfo("Part.Brand", "p_brand", "Brand", None, Some("PART"),
      (for (i <- 1 to 5; j <- 1 to 5) yield s"Brand#$i$j"), textKey = true,
      likePats = Seq("Brand#1", "#25")),
    LevelInfo("Part.Part", "p_partkey", "Part ID", Some(("p_name", "Part")),
      Some("PART"), (0 to 39).map(_.toString), textKey = false,
      parentSpellings = Seq("Part.Brand"),
      props = Seq(
        ("Part Type", "p_type", "Part Type"),
        ("Part Size", "p_size", "Part Size"))))

  private val bySpelling: Map[String, LevelInfo] = levels.map(l => l.spelling -> l).toMap

  // --------------------------------------------------------- measure pool

  /** Double via a string round-trip — portable between Spark and DuckDB and
    * bit-identical in both (correctly-rounded decimal→double either way). */
  private def d2d(e: String): String = s"CAST(CAST($e AS VARCHAR(64)) AS DOUBLE)"
  private val PD = "CAST(l_extendedprice AS DECIMAL(24,6))"
  private val QD = "CAST(l_quantity AS DECIMAL(12,6))"
  private val DD = "CAST(l_discount AS DECIMAL(8,6))"

  /** One measure: grammar name, SQL expr, plausible filter thresholds. */
  final case class MeaInfo(name: String, sqlExpr: String, thresholds: Seq[String])

  val measures: Seq[MeaInfo] = Seq(
    MeaInfo("Quantity", "sum(l_quantity)", Seq("0", "1000", "40000", "2000000")),
    MeaInfo("Row Count", "count(l_orderkey)", Seq("0", "10", "500", "50000")),
    MeaInfo("Max Price", "max(l_extendedprice)", Seq("10000", "55000", "90000")),
    MeaInfo("Min Price", "min(l_extendedprice)", Seq("1000", "2000", "8000")),
    MeaInfo("Extended Price", d2d(s"sum($PD)"), Seq("0", "1000000", "80000000")),
    MeaInfo("Revenue", d2d(s"sum($PD * (1 - $DD))"), Seq("0", "1000000", "80000000")),
    MeaInfo("Weighted Discount", d2d(s"sum($DD * $QD)"), Seq("0", "50", "2000")))

  // ------------------------------------------------------------ generator

  /** One generated case: the grammar-built CubeQuery and its SQL oracle. */
  final case class FuzzCase(name: String, query: CubeQuery, sql: String) {
    /** The spellings, for minimizing a failure into a qNN regression. */
    override def toString: String = s"$name: $sql"
  }

  private def die(m: String): Nothing = throw graft.plan.PlanError(m)

  def cases(n: Int, seed: Long = 42L): Seq[FuzzCase] = {
    val rng = new Random(seed)
    (1 to n).map(i => oneCase(f"fuzz_$i%03d", rng))
  }

  private def pick[A](rng: Random, xs: Seq[A]): A = xs(rng.nextInt(xs.length))
  private def pickN[A](rng: Random, xs: Seq[A], n: Int): Seq[A] =
    rng.shuffle(xs.toList).take(n)

  private def oneCase(name: String, rng: Random): FuzzCase = {
    // --- drilldowns: 1-3 distinct levels (Part.Part is rare: high card)
    val pool = levels.filter(l => l.spelling != "Part.Part" || rng.nextInt(8) == 0)
    val drills = pickN(rng, pool, 1 + rng.nextInt(3))
    // --- parents (prob ~1/4, only interesting when an ancestor exists)
    val parents = drills.exists(_.parentSpellings.nonEmpty) && rng.nextInt(4) == 0
    // --- properties: only on Part.Part, which declares them
    val props = drills.filter(_.props.nonEmpty).flatMap { l =>
      pickN(rng, l.props, rng.nextInt(l.props.length + 1))
        .map(p => (l, p))
    }
    // --- measures: 1-3 distinct
    val meas = pickN(rng, measures, 1 + rng.nextInt(3))
    // --- cuts: 0-2, on any pool level (drilled or not), include/exclude/like
    val cutLevels = pickN(rng, pool, rng.nextInt(3))
    val cuts = cutLevels.map { l =>
      val op = rng.nextInt(6) // 0-3 include, 4 exclude, 5 like (if possible)
      if (op == 5 && l.likePats.nonEmpty)
        (l, "*", Seq(pick(rng, l.likePats)))
      else if (op == 4)
        (l, "~", pickN(rng, l.members, 1 + rng.nextInt(2)))
      else
        (l, "", pickN(rng, l.members, 1 + rng.nextInt(math.min(3, l.members.length))))
    }
    // --- filters (HAVING): 0-1, on a chosen measure
    val filter = if (rng.nextInt(3) == 0) {
      val m = pick(rng, meas)
      val op = pick(rng, Seq("gt", "gte", "lt", "lte"))
      val second =
        if (rng.nextInt(3) == 0)
          Some((pick(rng, Seq("and", "or")), pick(rng, Seq("gt", "lt")), pick(rng, m.thresholds)))
        else None
      Some((m, op, pick(rng, m.thresholds), second))
    } else None
    // --- top (+ optional top_where), needs >= 2 drills so the partition is a strict subset
    val top = if (drills.length >= 2 && rng.nextInt(4) == 0) {
      val byLevel = pick(rng, drills)
      val m = pick(rng, meas)
      val dir = pick(rng, Seq("asc", "desc"))
      val tw = if (rng.nextInt(2) == 0) {
        val twm = pick(rng, meas)
        Some((twm, pick(rng, Seq("gt", "lt")), pick(rng, twm.thresholds)))
      } else None
      Some((1 + rng.nextInt(3), byLevel, m, dir, tw))
    } else None
    // --- growth (prob ~1/2 when a time level is drilled): lag-window calc
    // over an always-positive measure, composed with everything below
    // INCLUDING top — the planner computes the calc first, then applies
    // top over the grown frame with growth-reordered header tiebreaks
    val timeDrilled = drills.filter(_.spelling.startsWith("Ship Date."))
    val growth = if (timeDrilled.nonEmpty && rng.nextInt(2) == 0) {
      val candidates = meas.filter(m => m.name == "Quantity" || m.name == "Row Count")
      if (candidates.isEmpty) None
      else Some((pick(rng, candidates), pick(rng, timeDrilled)))
    } else None
    // --- sort: 0-1 on a measure
    val sort = if (rng.nextInt(3) == 0) Some((pick(rng, meas), pick(rng, Seq("asc", "desc")))) else None
    // --- limit/offset: only when the effective order is total (always is:
    // every generated order tiebreaks on all drill headers) — but never
    // under top-without-sort, whose planner default order isn't total
    val limit = if ((top.isEmpty || sort.isDefined) && rng.nextInt(4) == 0)
      Some((if (rng.nextInt(2) == 0) rng.nextInt(5) else 0, 1 + rng.nextInt(10)))
    else None
    val sparse = rng.nextInt(8) == 0

    // ---------------- grammar spellings -> CubeQuery (parser in the loop)
    val q = CubeQuery(
      drilldowns = drills.map(l => Drilldown.parse(l.spelling).fold(die, identity)),
      cuts = cuts.map { case (l, op, ms) =>
        CutSpec.parse(s"$op${l.spelling}.${ms.mkString(",")}").fold(die, identity)
      },
      measures = meas.map(m => MeasureName.parse(m.name).fold(die, identity)),
      properties = props.map { case (l, p) =>
        PropertyName.parse(s"${l.spelling}.${p._1}").fold(die, identity)
      },
      parents = parents,
      filters = filter.toSeq.map { case (m, op, v, second) =>
        val base = s"${m.name}.$op.$v"
        val full = second match {
          case Some((conj, op2, v2)) => s"$base.$conj.$op2.$v2"
          case None => base
        }
        FilterQuery.parse(full).fold(die, identity)
      },
      top = top.map { case (k, byLevel, m, dir, _) =>
        TopQuery.parse(s"$k,${byLevel.spelling},${m.name},$dir").fold(die, identity)
      },
      topWhere = top.flatMap(_._5).map { case (m, op, v) =>
        TopWhereQuery.parse(s"${m.name},$op.$v").fold(die, identity)
      },
      sort = sort.map { case (m, dir) => SortQuery.parse(s"${m.name}.$dir").fold(die, identity) },
      limit = limit.map { case (off, n) =>
        LimitQuery.parse(if (off > 0) s"$off,$n" else s"$n").fold(die, identity)
      },
      growth = growth.map { case (m, t) =>
        GrowthQuery.parse(s"${t.spelling},${m.name}").fold(die, identity)
      },
      sparse = sparse)

    FuzzCase(name, q,
      renderSql(drills, parents, props, meas, cuts, filter, top, sort, limit, sparse, growth))
  }

  // ------------------------------------------------------ rca generator

  /** RCA compositions: the planner runs one of planRca's two physical
    * branches (pinned a-grain re-aggregation for sum-class and max/min
    * measures, a grouping-sets rollup + grain equi-joins otherwise); the
    * oracle
    * renders the same algebra structurally independently — window sums
    * over one aggregate for integer-sum measures, per-grain grouped-from-
    * raw subqueries for the rest — a second derivation of (a/b)/(c/d)
    * either way. Exercises the internal-vs-external
    * cut split (rca.rs:100-127: cuts on drill_1 itself filter a and c ONLY,
    * after the full denominators are formed), external drilldowns, extra
    * display measures, and top / filter / sort / limit over the calc. */
  def rcaCases(n: Int, seed: Long = 777L): Seq[FuzzCase] = {
    val rng = new Random(seed)
    (1 to n).map(i => oneRcaCase(f"rcafuzz_$i%03d", rng))
  }

  /** Order-immune measures only (see the class doc's determinism rules). */
  private val immuneNames = Set("Quantity", "Row Count", "Max Price", "Min Price")

  /** rca measure pool (see [[oneRcaCase]]): window-sum oracles are valid
    * only for Quantity / Row Count (integer-valued — reordering-exact);
    * the rest render per-grain grouped-from-raw subqueries. Branch
    * routing (round 18): Quantity / Row Count / Weighted Discount /
    * Max Price / Min Price take planRca's one-scan re-aggregation form,
    * Avg Discount gates the legacy grouping-sets rollup. */
  private val rcaMeasures =
    measures.filter(m =>
      Set("Quantity", "Row Count", "Max Price", "Min Price", "Weighted Discount")(m.name)) :+
      MeaInfo("Avg Discount",
        s"${d2d("sum(CAST(l_discount AS DECIMAL(18,9)))")} / count(l_discount)", Seq("0"))
  private val rcaWindowOracleOk = Set("Quantity", "Row Count")

  private def oneRcaCase(name: String, rng: Random): FuzzCase = {
    val pool = levels.filterNot(_.spelling == "Part.Part")
    // drill_1, drill_2: two levels of distinct dimensions
    val d1 = pick(rng, pool)
    val d2 = pick(rng, pool.filterNot(l => dimOf(l) == dimOf(d1)))
    // optional external drilldown from a third dimension
    val extPool = pool.filterNot(l => dimOf(l) == dimOf(d1) || dimOf(l) == dimOf(d2))
    val ext = if (rng.nextInt(2) == 0) Some(pick(rng, extPool)) else None
    // the rca measure pool spans BOTH physical branches of planRca:
    // Quantity / Row Count / Weighted Discount are re-aggregable (one
    // pinned a-grain, b/c/d re-aggregate it), Max Price / Avg Discount are
    // not (the grouping-sets raw-row form). Every member is exact and
    // order-immune: integer-valued double sums, counts, max, and exact
    // decimal sums cast to double at the grain boundary.
    val rcaMea = pick(rng, rcaMeasures)
    val display = pickN(rng, measures.filter(m => immuneNames(m.name)), 1 + rng.nextInt(2))
    val rcaName = s"${rcaMea.name} RCA"
    // parents: ancestor chains prepend to ext/d1/d2 alike (planRca expands
    // each drill through outLevels with q.parents)
    val parents = (ext.toSeq ++ Seq(d1, d2)).exists(_.parentSpellings.nonEmpty) &&
      rng.nextInt(2) == 0
    // internal cut: on drill_1 itself — or, under parents, on one of its
    // ANCESTORS (both are drill_1 output levels, rca.rs:100-127 classifies
    // by column) — filters a and c only
    val internalLvl =
      if (parents && d1.parentSpellings.nonEmpty && rng.nextInt(2) == 0)
        bySpelling(pick(rng, d1.parentSpellings))
      else d1
    val internal = if (rng.nextInt(3) == 0) {
      val op = if (rng.nextInt(3) == 0) "~" else ""
      Some((op, pickN(rng, internalLvl.members, 1 + rng.nextInt(math.min(3, internalLvl.members.length)))))
    } else None
    // external cuts: any other level (including other levels of d1's and
    // d2's dims — ordinary scan-pushed cuts). Cuts on d1 itself are the
    // INTERNAL kind above; cuts on d2 itself are rejected by validation
    // (lib.rs:486-498), so neither is in the external pool. Under parents,
    // d1's whole ancestor chain is internal too (its levels are drill_1
    // output columns), so it leaves the external pool as well.
    val d1Chain = if (parents) d1.parentSpellings.toSet + d1.spelling else Set(d1.spelling)
    val extCuts = pickN(rng,
      pool.filterNot(l => d1Chain(l.spelling) || l.spelling == d2.spelling),
      rng.nextInt(3)).map { l =>
      val op = if (rng.nextInt(4) == 0) "~" else ""
      (l, op, pickN(rng, l.members, 1 + rng.nextInt(math.min(3, l.members.length))))
    }
    // top over the calc or a display measure (the q41 shape), by any drill;
    // optional top_where pre-filter on the calc or a display measure
    val top = if (rng.nextInt(4) == 0) {
      val by = pick(rng, ext.toSeq ++ Seq(d1, d2))
      val sortKey = if (rng.nextInt(2) == 0) "rca" else pick(rng, display).name
      Some((1 + rng.nextInt(3), by, sortKey, pick(rng, Seq("asc", "desc"))))
    } else None
    val topWhere = top.flatMap { _ =>
      if (rng.nextInt(2) != 0) None
      else if (rng.nextInt(2) == 0) Some(("rca", pick(rng, Seq("gt", "lt")), pick(rng, Seq("0", "1", "2"))))
      else { val m = pick(rng, display); Some((m.name, pick(rng, Seq("gt", "lt")), pick(rng, m.thresholds))) }
    }
    // HAVING-style filter on the calc or a display measure
    val filter = if (rng.nextInt(4) == 0) {
      val (key, thresholds) =
        if (rng.nextInt(2) == 0) ("rca", Seq("0", "1", "2"))
        else { val m = pick(rng, display); (m.name, m.thresholds) }
      Some((key, pick(rng, Seq("gt", "gte", "lt", "lte")), pick(rng, thresholds)))
    } else None
    val sort = if (rng.nextInt(3) == 0)
      Some((if (rng.nextInt(2) == 0) "rca" else pick(rng, display).name,
        pick(rng, Seq("asc", "desc"))))
    else None
    // limit only when the effective order is total (same rule as oneCase)
    val limit = if ((top.isEmpty || sort.isDefined) && rng.nextInt(4) == 0)
      Some((if (rng.nextInt(2) == 0) rng.nextInt(5) else 0, 1 + rng.nextInt(10)))
    else None

    val q = CubeQuery(
      drilldowns = ext.toSeq.map(l => Drilldown.parse(l.spelling).fold(die, identity)),
      cuts = (internal.toSeq.map { case (op, ms) => (internalLvl, op, ms) } ++ extCuts.map {
        case (l, op, ms) => (l, op, ms)
      }).map { case (l, op, ms) =>
        CutSpec.parse(s"$op${l.spelling}.${ms.mkString(",")}").fold(die, identity)
      },
      measures = display.map(m => MeasureName.parse(m.name).fold(die, identity)),
      parents = parents,
      rca = Some(RcaQuery.parse(s"${d1.spelling},${d2.spelling},${rcaMea.name}").fold(die, identity)),
      top = top.map { case (k, by, key, dir) =>
        TopQuery.parse(s"$k,${by.spelling},$key,$dir").fold(die, identity)
      },
      topWhere = topWhere.map { case (key, op, v) =>
        TopWhereQuery.parse(s"$key,$op.$v").fold(die, identity)
      },
      filters = filter.toSeq.map { case (key, op, v) =>
        FilterQuery.parse(s"$key.$op.$v").fold(die, identity)
      },
      sort = sort.map { case (key, dir) => SortQuery.parse(s"$key.$dir").fold(die, identity) },
      limit = limit.map { case (off, n0) =>
        LimitQuery.parse(if (off > 0) s"$off,$n0" else s"$n0").fold(die, identity)
      })

    // resolve the "rca" sort/filter keyword to the calc's output header
    def colOf(key: String): String = if (key == "rca") rcaName else key
    FuzzCase(name, q,
      renderRcaSql(ext, d1, d2, parents, rcaMea, rcaName, display,
        internal.map { case (op, ms) => (internalLvl, op, ms) }, extCuts,
        top.map { case (k, by, key, dir) => (k, by, colOf(key), dir) },
        topWhere.map { case (key, op, v) => (colOf(key), op, v) },
        filter.map { case (key, op, v) => (colOf(key), op, v) },
        sort.map { case (key, dir) => (colOf(key), dir) },
        limit))
  }

  private def cmpOp(op: String): String = op match {
    case "gt" => ">"; case "gte" => ">="; case "lt" => "<"; case "lte" => "<="
    case other => sys.error(s"unreachable op $other")
  }

  private def renderRcaSql(
      ext: Option[LevelInfo], d1: LevelInfo, d2: LevelInfo, parents: Boolean,
      rcaMea: MeaInfo, rcaName: String, display: Seq[MeaInfo],
      internal: Option[(LevelInfo, String, Seq[String])],
      extCuts: Seq[(LevelInfo, String, Seq[String])],
      top: Option[(Int, LevelInfo, String, String)],
      topWhere: Option[(String, String, String)],
      filter: Option[(String, String, String)],
      sort: Option[(String, String)],
      limit: Option[(Int, Int)]): String = {

    def hc(l: LevelInfo): Seq[(String, String)] =
      (l.keyExpr -> l.keyHeader) +: l.name.map { case (c, h) => c -> h }.toSeq
    // parents expand each drill through its ancestor chain, ancestors first
    // (planRca feeds q.parents to outLevels per drill)
    def chain(l: LevelInfo): Seq[LevelInfo] = outLevels(Seq(l), parents)
    val extChain = ext.toSeq.flatMap(chain)
    val d1Chain  = chain(d1)
    val d2Chain  = chain(d2)
    val lvls = extChain ++ d1Chain ++ d2Chain
    val drillCols = lvls.flatMap(hc)
    val headers = drillCols.map(_._2)

    val needed = (lvls ++ extCuts.map(_._1)).flatMap(_.join).distinct
    val from = ("lineitem" +: Seq("GEO", "CUST", "PART").filter(needed.contains).map(joins))
      .mkString(" ")
    val where = extCuts.map {
      case (l, "", ms)  => s"${l.keyExpr} IN (${lits(l, ms)})"
      case (l, "~", ms) => s"${l.keyExpr} NOT IN (${lits(l, ms)})"
      case other => sys.error(s"unreachable cut $other")
    } match { case Nil => ""; case ps => " WHERE " + ps.mkString(" AND ") }

    val baseSel = drillCols.map { case (e, h) => s"$e AS ${qt(h)}" } ++
      (s"${rcaMea.sqlExpr} AS __a" +: display.map(m => s"${m.sqlExpr} AS ${qt(m.name)}"))
    val base = s"SELECT ${baseSel.mkString(", ")} FROM $from$where" +
      s" GROUP BY ${drillCols.indices.map(_ + 1).mkString(", ")}"

    // (a/b)/(c/d): b over ext+d2 keys, c over ext+d1 keys, d over ext keys
    // (full CHAINS under parents — planRca's setB/C/D are the chains' key
    // headers) — full denominators, formed BEFORE any internal cut.
    // Two renderings: window sums over the a-grain __a are exact only for
    // integer-sum measures (reordering-exact); everything else aggregates
    // each grain FROM RAW ROWS in its own grouped subquery — the same
    // algebra as the planner's grouping-sets branch, and for exact-decimal
    // measures (Weighted Discount) the only form whose per-grain sums
    // match the planner's native-decimal re-aggregation bit-for-bit.
    val extKeys = extChain.map(_.keyHeader)
    val bKeys = extKeys ++ d2Chain.map(_.keyHeader)
    val cKeys = extKeys ++ d1Chain.map(_.keyHeader)
    var sql =
      if (rcaWindowOracleOk(rcaMea.name)) {
        def win(keys: Seq[String]): String =
          if (keys.isEmpty) "sum(__a) OVER ()"
          else s"sum(__a) OVER (PARTITION BY ${keys.map(qt).mkString(", ")})"
        val rcaExpr = s"(__a / ${win(bKeys)}) / (${win(cKeys)} / ${win(extKeys)})"
        val calcSel = (headers.map(qt) :+ s"$rcaExpr AS ${qt(rcaName)}") ++
          display.map(m => qt(m.name))
        s"WITH base AS ($base), calc AS (SELECT ${calcSel.mkString(", ")} FROM base)"
      } else {
        val exprOf = drillCols.map { case (e, h) => h -> e }.toMap
        def grain(keys: Seq[String], out: String): String =
          if (keys.isEmpty) s"SELECT ${rcaMea.sqlExpr} AS $out FROM $from$where"
          else s"SELECT ${keys.map(k => s"${exprOf(k)} AS ${qt(k)}").mkString(", ")}, " +
            s"${rcaMea.sqlExpr} AS $out FROM $from$where " +
            s"GROUP BY ${keys.indices.map(_ + 1).mkString(", ")}"
        def joinOn(t: String, keys: Seq[String]): String =
          if (keys.isEmpty) s"CROSS JOIN $t"
          else "JOIN " + t + " ON " + keys.map(k =>
            s"base.${qt(k)} IS NOT DISTINCT FROM $t.${qt(k)}").mkString(" AND ")
        // NULL-on-zero division, portable across spark.sql-under-ANSI and
        // DuckDB (the planner's try_divide semantics); the nested CASE
        // short-circuits so no branch ever divides by zero
        val rcaExpr = "CASE WHEN __b = 0 OR __d = 0 THEN NULL " +
          "WHEN __c / __d = 0 THEN NULL " +
          "ELSE (__a / __b) / (__c / __d) END"
        val calcSel = (headers.map(h => s"base.${qt(h)}") :+
          s"$rcaExpr AS ${qt(rcaName)}") ++
          display.map(m => s"base.${qt(m.name)}")
        s"WITH base AS ($base), bfr AS (${grain(bKeys, "__b")}), " +
          s"cfr AS (${grain(cKeys, "__c")}), dfr AS (${grain(extKeys, "__d")}), " +
          s"calc AS (SELECT ${calcSel.mkString(", ")} FROM base " +
          s"${joinOn("bfr", bKeys)} ${joinOn("cfr", cKeys)} ${joinOn("dfr", extKeys)})"
      }
    var cur = "calc"
    internal.foreach { case (lvl, op, ms) =>
      val neg = if (op == "~") "NOT " else ""
      sql += s""", cut AS (SELECT * FROM $cur WHERE ${qt(lvl.keyHeader)} $neg""" +
        s"""IN (${lits(lvl, ms)}))"""
      cur = "cut"
    }
    top.foreach { case (k, by, col, dir) =>
      // top_where pre-filters the frame before the top window (planner
      // option order: top_where → top)
      val twWhere = topWhere.map { case (c, op, v) =>
        s" WHERE ${qt(c)} ${cmpOp(op)} $v" }.getOrElse("")
      val tiebreak = headers.filterNot(_ == by.keyHeader).map(h => s"${qt(h)} ASC")
      val order = (s"${qt(col)} ${dir.toUpperCase}" +: tiebreak).mkString(", ")
      val allCols = ((headers :+ rcaName) ++ display.map(_.name)).map(qt).mkString(", ")
      sql += s", topped AS (SELECT $allCols FROM (SELECT t.*, row_number() OVER " +
        s"(PARTITION BY ${qt(by.keyHeader)} ORDER BY $order) AS __rn FROM " +
        s"(SELECT * FROM $cur$twWhere) t) WHERE __rn <= $k)"
      cur = "topped"
    }
    filter.foreach { case (col, op, v) =>
      sql += s", filtered AS (SELECT * FROM $cur WHERE ${qt(col)} ${cmpOp(op)} $v)"
      cur = "filtered"
    }
    val orderBy = limit match {
      case None => ""
      case Some(_) =>
        val cols = sort match {
          case Some((col, dir)) => s"${qt(col)} ${dir.toUpperCase}" +: headers.map(h => s"${qt(h)} ASC")
          case None             => headers.map(h => s"${qt(h)} ASC")
        }
        s" ORDER BY ${cols.mkString(", ")}"
    }
    val limitSql = limit.map { case (off, n0) =>
      if (off > 0) s" LIMIT $n0 OFFSET $off" else s" LIMIT $n0"
    }.getOrElse("")
    s"$sql SELECT * FROM $cur$orderBy$limitSql"
  }

  // ----------------------------------------------------- rate generator

  /** Rate compositions: the planner fuses the member share into ONE
    * conditional-aggregate pass (CubePlanner.planRate); the oracle derives
    * the same value as sum(CASE)/total with the planner's null-part group
    * drop as HAVING, then filter → sort → limit in planner option order. */
  def rateCases(n: Int, seed: Long = 888L): Seq[FuzzCase] = {
    val rng = new Random(seed)
    (1 to n).map(i => oneRateCase(f"ratefuzz_$i%03d", rng))
  }

  private def oneRateCase(name: String, rng: Random): FuzzCase = {
    val pool = levels.filterNot(_.spelling == "Part.Part")
    val rateLvl = pick(rng, pool)
    val members = pickN(rng, rateLvl.members, 1 + rng.nextInt(math.min(3, rateLvl.members.length)))
    // drilldowns disjoint from the rate level (it folds into the scan grain)
    val drills = pickN(rng, pool.filterNot(_.spelling == rateLvl.spelling), rng.nextInt(3))
    // rate requires a single sum/count measure
    val mea = pick(rng, measures.filter(m => m.name == "Quantity" || m.name == "Row Count"))
    // cuts on any level, INCLUDING the rate level (scan-pushed: restricts
    // numerator and denominator alike)
    val cuts = pickN(rng, pool, rng.nextInt(3)).map { l =>
      val op = if (rng.nextInt(4) == 0) "~" else ""
      (l, op, pickN(rng, l.members, 1 + rng.nextInt(math.min(3, l.members.length))))
    }
    val filter = if (rng.nextInt(4) == 0)
      Some((mea.name, pick(rng, Seq("gt", "gte", "lt", "lte")), pick(rng, mea.thresholds)))
    else None
    val sort = if (rng.nextInt(3) == 0)
      Some((if (rng.nextInt(2) == 0) "Rate" else mea.name, pick(rng, Seq("asc", "desc"))))
    else None
    val limit = if (rng.nextInt(4) == 0)
      Some((if (rng.nextInt(2) == 0) rng.nextInt(5) else 0, 1 + rng.nextInt(10)))
    else None

    val q = CubeQuery(
      drilldowns = drills.map(l => Drilldown.parse(l.spelling).fold(die, identity)),
      cuts = cuts.map { case (l, op, ms) =>
        CutSpec.parse(s"$op${l.spelling}.${ms.mkString(",")}").fold(die, identity)
      },
      measures = Seq(MeasureName.parse(mea.name).fold(die, identity)),
      rate = Some(RateQuery.parse(s"${rateLvl.spelling}.${members.mkString(",")}").fold(die, identity)),
      filters = filter.toSeq.map { case (key, op, v) =>
        FilterQuery.parse(s"$key.$op.$v").fold(die, identity)
      },
      sort = sort.map { case (key, dir) => SortQuery.parse(s"$key.$dir").fold(die, identity) },
      limit = limit.map { case (off, n0) =>
        LimitQuery.parse(if (off > 0) s"$off,$n0" else s"$n0").fold(die, identity)
      })

    FuzzCase(name, q,
      renderRateSql(drills, rateLvl, members, mea, cuts, filter, sort, limit))
  }

  private def renderRateSql(
      drills: Seq[LevelInfo], rateLvl: LevelInfo, members: Seq[String],
      mea: MeaInfo, cuts: Seq[(LevelInfo, String, Seq[String])],
      filter: Option[(String, String, String)],
      sort: Option[(String, String)],
      limit: Option[(Int, Int)]): String = {

    def hc(l: LevelInfo): Seq[(String, String)] =
      (l.keyExpr -> l.keyHeader) +: l.name.map { case (c, h) => c -> h }.toSeq
    val drillCols = drills.flatMap(hc)
    val headers = drillCols.map(_._2)

    val needed = (drills ++ Seq(rateLvl) ++ cuts.map(_._1)).flatMap(_.join).distinct
    val from = ("lineitem" +: Seq("GEO", "CUST", "PART").filter(needed.contains).map(joins))
      .mkString(" ")
    val where = cuts.map {
      case (l, "", ms)  => s"${l.keyExpr} IN (${lits(l, ms)})"
      case (l, "~", ms) => s"${l.keyExpr} NOT IN (${lits(l, ms)})"
      case other => sys.error(s"unreachable cut $other")
    } match { case Nil => ""; case ps => " WHERE " + ps.mkString(" AND ") }

    // member-part aggregate: NULL (not 0) when a group has no member rows,
    // so HAVING drops the group — exactly planRate's `__part IS NOT NULL`
    val inList = lits(rateLvl, members)
    val (den, num) = mea.name match {
      case "Quantity" =>
        ("sum(l_quantity)",
          s"sum(CASE WHEN ${rateLvl.keyExpr} IN ($inList) THEN l_quantity END)")
      case "Row Count" =>
        ("count(l_orderkey)",
          s"sum(CASE WHEN ${rateLvl.keyExpr} IN ($inList) AND l_orderkey IS NOT NULL THEN 1 END)")
      case other => sys.error(s"unreachable rate measure $other")
    }

    val sel = drillCols.map { case (e, h) => s"$e AS ${qt(h)}" } ++
      Seq(s"$den AS ${qt(mea.name)}", s"$num / $den AS ${qt("Rate")}")
    val groupBy =
      if (drillCols.isEmpty) "" else s" GROUP BY ${drillCols.indices.map(_ + 1).mkString(", ")}"
    val base = s"SELECT ${sel.mkString(", ")} FROM $from$where$groupBy HAVING $num IS NOT NULL"

    var sql = s"WITH base AS ($base)"
    var cur = "base"
    filter.foreach { case (col, op, v) =>
      sql += s", filtered AS (SELECT * FROM $cur WHERE ${qt(col)} ${cmpOp(op)} $v)"
      cur = "filtered"
    }
    val orderBy = limit match {
      case None => ""
      case Some(_) =>
        val cols = sort match {
          case Some((col, dir)) => s"${qt(col)} ${dir.toUpperCase}" +: headers.map(h => s"${qt(h)} ASC")
          case None             => headers.map(h => s"${qt(h)} ASC")
        }
        // no drills and no sort: a single global group — nothing to order
        if (cols.isEmpty) "" else s" ORDER BY ${cols.mkString(", ")}"
    }
    val limitSql = limit.map { case (off, n0) =>
      if (off > 0) s" LIMIT $n0 OFFSET $off" else s" LIMIT $n0"
    }.getOrElse("")
    s"$sql SELECT * FROM $cur$orderBy$limitSql"
  }

  // ------------------------------------------------- logic-layer generator

  /** One generated logic-layer case: the WIRE params (exercising the bare
    * level-name / Level=member / exclude / time param grammar through
    * QueryParams.toLogicLayerQuery) and the SQL oracle mirroring the LL
    * semantics: same-dim multi-level cuts fan out into a positional
    * column-wise UNION ALL with the cut levels auto-added as drilldowns
    * (reference logic_layer/aggregate.rs:810-916), `time=` resolves to the
    * level's newest/oldest member, `exclude=` post-filters result rows. */
  final case class LlFuzzCase(name: String, params: Map[String, Seq[String]], sql: String)

  private def lvlName(l: LevelInfo): String = l.spelling.split('.').last
  private def dimOf(l: LevelInfo): String = l.spelling.split('.').head

  def llCases(n: Int, seed: Long = 4242L): Seq[LlFuzzCase] = {
    val rng = new Random(seed)
    (1 to n).map(i => oneLlCase(f"llfuzz_$i%03d", rng))
  }

  private def oneLlCase(name: String, rng: Random): LlFuzzCase = {
    // Part.Part excluded: bare name "Part" resolves, but high cardinality
    val pool = levels.filterNot(_.spelling == "Part.Part")
    val drills = pickN(rng, pool, 1 + rng.nextInt(2))
    val meas = pickN(rng, measures, 1 + rng.nextInt(2))
    // fan-out pair: two cuts in ONE dimension (same column-shape pairs so
    // the positional union is type-consistent, like the reference requires)
    // a fan-out pair whose level is ALREADY drilled makes combo widths
    // diverge (one combo auto-adds it, the other doesn't) — the engine
    // rejects that as a fan-out width mismatch, so only generate pairs
    // disjoint from the drill set (the valid-query space)
    val fanPair = if (rng.nextInt(3) == 0)
      pick(rng, Seq(
        ("Geography.Region", "Geography.Nation"),
        ("Ship Date.Year", "Ship Date.Month"))) match {
        case (a, b) if !drills.exists(l => l.spelling == a || l.spelling == b) => Some((a, b))
        case _ => None
      }
    else None
    val fanCuts = fanPair.toSeq.flatMap { case (a, b) => Seq(bySpelling(a), bySpelling(b)) }
      .map(l => (l, pickN(rng, l.members, 1 + rng.nextInt(2))))
    val fanDims = fanCuts.map(c => dimOf(c._1)).toSet
    val singles = pickN(rng, pool.filterNot(l => fanDims.contains(dimOf(l))), rng.nextInt(2))
      .map(l => (l, pickN(rng, l.members, 1 + rng.nextInt(3))))
    val cuts = fanCuts ++ singles
    val time = if (rng.nextInt(4) == 0 && !cuts.exists(_._1.spelling.startsWith("Ship Date.")))
      Some(pick(rng, Seq("latest", "oldest")))
    else None
    val exclude = if (rng.nextInt(3) == 0) {
      val l = pick(rng, drills)
      Some((l, pickN(rng, l.members, 1 + rng.nextInt(2))))
    } else None
    val filter = if (rng.nextInt(4) == 0) {
      val m = pick(rng, meas)
      Some((m, pick(rng, Seq("gt", "lt")), pick(rng, m.thresholds)))
    } else None
    // sort/limit apply PER FAN-OUT COMBO (the LL threads them into each
    // combo's CubeQuery; the union concatenates the per-combo slices —
    // aggregate.rs runs one limited query per combo and appends)
    val sort = if (rng.nextInt(3) == 0)
      Some((pick(rng, meas), pick(rng, Seq("asc", "desc"))))
    else None
    val limit = if (rng.nextInt(3) == 0)
      Some((if (rng.nextInt(2) == 0) rng.nextInt(3) else 0, 1 + rng.nextInt(8)))
    else None

    // ListMap: QueryParams.toLogicLayerQuery takes cuts in the params map's
    // ITERATION order (no sort), and the fan-out combo order — hence which
    // combo's headers the positional consolidation keeps — follows it. A
    // plain Map hash-scrambles at 5+ entries; insertion order keeps the
    // oracle's combo order aligned with the engine's.
    val params: Map[String, Seq[String]] = scala.collection.immutable.ListMap(
      (Seq(
        "drilldowns" -> Seq(drills.map(lvlName).mkString(",")),
        "measures"   -> Seq(meas.map(_.name).mkString(","))) ++
        cuts.map { case (l, ms) => lvlName(l) -> Seq(ms.mkString(",")) } ++
        exclude.map { case (l, ms) => "exclude" -> Seq(s"${lvlName(l)}:${ms.mkString(",")}") } ++
        time.map(w => "time" -> Seq(s"Year.$w")) ++
        filter.map { case (m, op, v) => "filters" -> Seq(s"${m.name}.$op.$v") } ++
        sort.map { case (m, dir) => "sort" -> Seq(s"${m.name}.$dir") } ++
        limit.map { case (off, n0) =>
          "limit" -> Seq(if (off > 0) s"$off,$n0" else s"$n0") }): _*)

    LlFuzzCase(name, params, renderLlSql(drills, meas, cuts, time, exclude, filter, sort, limit))
  }

  private def renderLlSql(
      drills: Seq[LevelInfo], meas: Seq[MeaInfo],
      cuts: Seq[(LevelInfo, Seq[String])],
      time: Option[String],
      exclude: Option[(LevelInfo, Seq[String])],
      filter: Option[(MeaInfo, String, String)],
      sort: Option[(MeaInfo, String)] = None,
      limit: Option[(Int, Int)] = None): String = {

    // resolved cuts: the param cuts in PARAM ORDER (the engine takes them in
    // params-map iteration order — see the ListMap note in oneLlCase) plus
    // the resolved time member appended last (LogicLayer.plan:
    // cuts ++ timeCut); the time member is a scalar subquery — the level's
    // member set is the fact's distinct years.
    final case class RCut(l: LevelInfo, members: Seq[String], timeAgg: Option[String])
    val resolved = cuts.map { case (l, ms) => RCut(l, ms, None) } ++
      time.map(w => RCut(bySpelling("Ship Date.Year"), Nil,
        Some(if (w == "latest") "max" else "min")))

    // fan-out mirror (LogicLayer.fanOut): group cuts by dimension, cartesian
    // one-cut-per-dimension, multi-cut dims auto-add the cut level as drill
    val dims = resolved.map(c => dimOf(c.l)).distinct
    val byDim = dims.map(d => resolved.filter(c => dimOf(c.l) == d))
    val multiLevel = byDim.filter(_.length > 1).flatten.map(_.l.spelling).toSet
    val combos = byDim.foldLeft(Seq(Seq.empty[RCut])) { (acc, cs) =>
      acc.flatMap(partial => cs.map(partial :+ _))
    }

    def levelsOf(combo: Seq[RCut]): Seq[LevelInfo] =
      drills ++ combo.collect {
        case c if multiLevel.contains(c.l.spelling) && !drills.contains(c.l) => c.l
      }
    def headerCols(l: LevelInfo): Seq[(String, String)] =
      (l.keyExpr -> l.keyHeader) +: l.name.map { case (c, h) => c -> h }.toSeq

    // positional consolidation: every combo aliases its columns to the FIRST
    // combo's headers (reference aggregate.rs:333-534)
    val firstHeaders = levelsOf(combos.head).flatMap(headerCols).map(_._2)

    val comboSelects = combos.map { combo =>
      val lvls = levelsOf(combo)
      val drillCols = lvls.flatMap(headerCols)
      require(drillCols.length == firstHeaders.length, "fan-out width mismatch in generator")
      val sel = drillCols.zip(firstHeaders).map { case ((e, _), h) => s"$e AS ${qt(h)}" } ++
        meas.map(m => s"${m.sqlExpr} AS ${qt(m.name)}")
      val needed = (lvls ++ combo.map(_.l)).flatMap(_.join).distinct
      val from = ("lineitem" +: Seq("GEO", "CUST", "PART").filter(needed.contains).map(joins))
        .mkString(" ")
      val preds = combo.map {
        case RCut(l, _, Some(agg)) =>
          s"${l.keyExpr} = (SELECT $agg(${l.keyExpr}) FROM lineitem)"
        case RCut(l, ms, None) => s"${l.keyExpr} IN (${lits(l, ms)})"
      }
      val where = if (preds.isEmpty) "" else s" WHERE ${preds.mkString(" AND ")}"
      val groupBy = s" GROUP BY ${drillCols.indices.map(_ + 1).mkString(", ")}"
      val having = filter.map { case (m, op, v) =>
        val c = if (op == "gt") ">" else "<"
        s" HAVING ${m.sqlExpr} $c $v"
      }.getOrElse("")
      // per-combo sort/limit: each combo orders by its own (aliased) header
      // columns — totalized by the full drill grain — and slices
      // independently, exactly as the LL threads limit into each combo's
      // CubeQuery before the union
      val orderLimit = if (sort.isEmpty && limit.isEmpty) "" else {
        val orderCols = sort.toSeq.map { case (m, dir) => s"${qt(m.name)} ${dir.toUpperCase}" } ++
          firstHeaders.map(h => s"${qt(h)} ASC")
        val lim = limit.map { case (off, n0) =>
          if (off > 0) s" LIMIT $n0 OFFSET $off" else s" LIMIT $n0"
        }.getOrElse("")
        s" ORDER BY ${orderCols.mkString(", ")}$lim"
      }
      val body = s"SELECT ${sel.mkString(", ")} FROM $from$where$groupBy$having$orderLimit"
      if (orderLimit.isEmpty) body else s"($body)"
    }

    val union = comboSelects.mkString(" UNION ALL ")
    exclude match {
      case None => union
      case Some((l, ms)) =>
        // applyExclude filters "{Level} ID" when the level has a name column,
        // else the bare level header — which is exactly keyHeader either way;
        // the drilled level's own headers survive consolidation unrenamed
        s"SELECT * FROM ($union) u WHERE ${qt(l.keyHeader)} NOT IN (${lits(l, ms)})"
    }
  }

  // -------------------------------------------------------- SQL rendering

  /** The planner's outLevels expansion, mirrored: parents prepend ancestor
    * levels per drill, duplicates collapse (order-preserving). */
  private def outLevels(drills: Seq[LevelInfo], parents: Boolean): Seq[LevelInfo] = {
    val raw = drills.flatMap { l =>
      if (parents) l.parentSpellings.map(bySpelling) :+ l else Seq(l)
    }
    raw.distinct
  }

  private def qt(id: String): String = "\"" + id + "\""
  private def lits(l: LevelInfo, ms: Seq[String]): String =
    ms.map(m => if (l.textKey) s"'$m'" else m).mkString(", ")

  private def renderSql(
      drills: Seq[LevelInfo], parents: Boolean,
      props: Seq[(LevelInfo, (String, String, String))],
      meas: Seq[MeaInfo],
      cuts: Seq[(LevelInfo, String, Seq[String])],
      filter: Option[(MeaInfo, String, String, Option[(String, String, String)])],
      top: Option[(Int, LevelInfo, MeaInfo, String, Option[(MeaInfo, String, String)])],
      sort: Option[(MeaInfo, String)],
      limit: Option[(Int, Int)],
      sparse: Boolean,
      growth: Option[(MeaInfo, LevelInfo)] = None): String = {

    val outs = outLevels(drills, parents)
    // header -> select expr, in planner column order (key, name, props)
    val drillCols: Seq[(String, String)] = outs.flatMap { l =>
      val base = Seq(l.keyExpr -> l.keyHeader) ++ l.name.map { case (c, h) => c -> h }
      val pr = props.filter(_._1.spelling == l.spelling).map { case (_, (_, c, h)) => c -> h }
      base ++ pr
    }
    val meaCols: Seq[(String, String)] = meas.map(m => m.sqlExpr -> m.name)
    val headers = drillCols.map(_._2)

    val needed = (outs ++ cuts.map(_._1)).flatMap(_.join).distinct
    val from = ("lineitem" +: Seq("GEO", "CUST", "PART").filter(needed.contains).map(joins))
      .mkString(" ")

    val where = cuts.map {
      case (l, "", ms)  => s"${l.keyExpr} IN (${lits(l, ms)})"
      case (l, "~", ms) => s"${l.keyExpr} NOT IN (${lits(l, ms)})"
      case (l, "*", Seq(pat)) => s"${l.keyExpr} LIKE '%$pat%'"
      case other => sys.error(s"unreachable cut $other")
    } match { case Nil => ""; case ps => " WHERE " + ps.mkString(" AND ") }

    val selectList = (drillCols ++ meaCols).map { case (e, h) => s"$e AS ${qt(h)}" }.mkString(", ")
    val groupBy =
      if (drillCols.isEmpty) "" else s" GROUP BY ${drillCols.indices.map(_ + 1).mkString(", ")}"
    val base = s"SELECT $selectList FROM $from$where$groupBy"


    // planner option order: growth calc first, then
    // top_where -> top -> filters+sparse -> sort -> limit
    var sql = s"WITH base AS ($base)"
    var cur = "base"
    // growth: lag window partitioned by the non-time KEY headers, ordered by
    // the time KEY headers (outs order); null in the first period. The
    // planner also reorders headers other-then-time — order-insensitive for
    // the row-sorted compare, but the limit ORDER BY below must follow it.
    var orderHeaders = headers
    growth.foreach { case (m, _) =>
      val isTime = (l: LevelInfo) => l.spelling.startsWith("Ship Date.")
      val timeOuts = outs.filter(isTime)
      val otherOuts = outs.filterNot(isTime)
      val partition = otherOuts.map(o => qt(o.keyHeader)) match {
        case Nil => ""; case ps => s"PARTITION BY ${ps.mkString(", ")} "
      }
      val w = s"($partition" + s"ORDER BY ${timeOuts.map(o => s"${qt(o.keyHeader)} ASC").mkString(", ")})"
      val lagM = s"lag(${qt(m.name)}) OVER $w"
      sql += s""", grown AS (SELECT *, CASE WHEN $lagM > 0 THEN (${qt(m.name)} - $lagM) / $lagM END AS ${qt(m.name + " Growth")}, ${qt(m.name)} - $lagM AS ${qt(m.name + " Growth Value")} FROM $cur)"""
      cur = "grown"
      val headerOf = (ls: Seq[LevelInfo]) => ls.flatMap { l =>
        val pr = props.filter(_._1.spelling == l.spelling).map(_._2._3)
        (l.keyHeader +: l.name.map(_._2).toSeq) ++ pr
      }
      orderHeaders = headerOf(otherOuts) ++ headerOf(timeOuts)
    }
    top.foreach { case (k, byLevel, m, dir, tw) =>
      val twWhere = tw.map { case (tm, op, v) => s" WHERE ${qt(tm.name)} ${cmpOp(op)} $v" }.getOrElse("")
      // under growth the planner's tiebreak priority follows the REORDERED
      // headers (other-then-time), and the grown frame's calc columns ride
      // through the top stage
      val tiebreak = orderHeaders.filterNot(_ == byLevel.keyHeader).map(h => s"${qt(h)} ASC")
      val order = (s"${qt(m.name)} ${dir.toUpperCase}" +: tiebreak).mkString(", ")
      val growthCols = growth.toSeq.flatMap { case (gm, _) =>
        Seq(gm.name + " Growth", gm.name + " Growth Value") }
      val allCols = (headers ++ meas.map(_.name) ++ growthCols).map(qt).mkString(", ")
      sql += s", topped AS (SELECT $allCols FROM (SELECT t.*, row_number() OVER (PARTITION BY ${qt(byLevel.keyHeader)} ORDER BY $order) AS __rn FROM (SELECT * FROM $cur$twWhere) t) WHERE __rn <= $k)"
      cur = "topped"
    }
    val havingPreds =
      filter.toSeq.map { case (m, op, v, second) =>
        val p1 = s"${qt(m.name)} ${cmpOp(op)} $v"
        second match {
          case Some((conj, op2, v2)) => s"($p1 ${conj.toUpperCase} ${qt(m.name)} ${cmpOp(op2)} $v2)"
          case None => p1
        }
      } ++ (if (sparse) meas.map(m => s"${qt(m.name)} IS NOT NULL") else Nil)
    if (havingPreds.nonEmpty) {
      sql += s", filtered AS (SELECT * FROM $cur WHERE ${havingPreds.mkString(" AND ")})"
      cur = "filtered"
    }

    // ordering only matters when a limit selects a subset; every generated
    // order is total (sort tiebreaks on all drill headers; the default is
    // the full drill-header prefix itself)
    val orderBy = limit match {
      case None => ""
      case Some(_) =>
        val cols = sort match {
          case Some((m, dir)) => s"${qt(m.name)} ${dir.toUpperCase}" +: orderHeaders.map(h => s"${qt(h)} ASC")
          case None           => orderHeaders.map(h => s"${qt(h)} ASC")
        }
        s" ORDER BY ${cols.mkString(", ")}"
    }
    val limitSql = limit.map { case (off, n) =>
      if (off > 0) s" LIMIT $n OFFSET $off" else s" LIMIT $n"
    }.getOrElse("")

    s"$sql SELECT * FROM $cur$orderBy$limitSql"
  }
}
