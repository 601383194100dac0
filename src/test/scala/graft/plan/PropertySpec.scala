package graft.plan

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.engine.TpchStar
import graft.SparkTestSession.{spark, SfDir}

/** Algebraic invariants of the cube algebra (SURVEY §5 strategy (c)),
  * checked across every drillable level of the fixture rather than one
  * hand-picked case. */
class PropertySpec extends AnyFunSuite {

  private def die(m: String): Nothing = throw PlanError(m)
  private def drill(s: String) = Drilldown.parse(s).fold(die, identity)
  private def mea(s: String) = MeasureName.parse(s).fold(die, identity)
  private def planner = TpchStar.planner(SfDir)

  private val levels = Seq(
    "Return Flag.Return Flag", "Line Status.Line Status",
    "Geography.Region", "Geography.Nation", "Customer.Segment", "Ship Date.Year")

  test("sum over any drilldown equals the grand total") {
    val total = planner.plan(spark, CubeQuery(
      cuts = Seq(CutSpec.parse("~Geography.Region.999").fold(die, identity)),
      measures = Seq(mea("Quantity")))).head().getDouble(0)
    // levels backed by the fact itself partition it exactly; join-backed
    // levels must match because the fixture is referentially complete
    for (l <- levels) {
      val rows = planner.plan(spark, CubeQuery(
        drilldowns = Seq(drill(l)), measures = Seq(mea("Quantity")))).collect()
      val sum = rows.map(r => r.getDouble(r.length - 1)).sum
      assert(sum == total, s"level $l: $sum != $total")
    }
  }

  test("include-cut plus exclude-cut partitions every level") {
    for (l <- Seq("Geography.Region", "Ship Date.Year")) {
      val ln = l.split('.')(1)
      val all = planner.plan(spark, CubeQuery(
        drilldowns = Seq(drill(l)), measures = Seq(mea("Quantity")))).collect()
      val firstKey = String.valueOf(all.head.get(0))
      val inc = planner.plan(spark, CubeQuery(
        drilldowns = Seq(drill(l)),
        cuts = Seq(CutSpec(LevelName("_", "_", "_"), Nil).copy(
          levelName = Drilldown.parse(l).toOption.get.levelName, members = Seq(firstKey))),
        measures = Seq(mea("Quantity")))).collect()
      val exc = planner.plan(spark, CubeQuery(
        drilldowns = Seq(drill(l)),
        cuts = Seq(CutSpec(Drilldown.parse(l).toOption.get.levelName, Seq(firstKey), Mask.Exclude)),
        measures = Seq(mea("Quantity")))).collect()
      assert(inc.length + exc.length == all.length, s"level $ln")
      val totAll = all.map(r => r.getDouble(r.length - 1)).sum
      val totSplit = (inc ++ exc).map(r => r.getDouble(r.length - 1)).sum
      assert(math.abs(totAll - totSplit) < 1e-6)
    }
  }

  test("growth of each first period is null; reconstructed series matches") {
    val rows = planner.plan(spark, CubeQuery(
      drilldowns = Seq(drill("Ship Date.Year"), drill("Return Flag.Return Flag")),
      measures = Seq(mea("Quantity")),
      growth = Some(GrowthQuery.parse("Ship Date.Year,Quantity").fold(die, identity)))).collect()
    val byFlag = rows.groupBy(_.getString(0))
    byFlag.values.foreach { rs =>
      val ordered = rs.sortBy(_.getLong(1))
      assert(ordered.head.isNullAt(3) && ordered.head.isNullAt(4))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(math.abs(b.getDouble(4) - (b.getDouble(2) - a.getDouble(2))) < 1e-9)
        case _ =>
      }
    }
  }

  test("rca values of a drill1 member weight-average to 1 over its drill2 mix") {
    // sum over d2 of a/b == (c/d) * sum of rca weighted by b-share; the
    // cheap strong check: global sum of a == d, per-(d1) sum of a == c
    val df = planner.plan(spark, CubeQuery(
      measures = Seq(mea("Quantity")),
      rca = Some(RcaQuery.parse("Geography.Region,Return Flag.Return Flag,Quantity").fold(die, identity)),
      debug = true)).collect()
    val d = df.head.getDouble(6)
    assert(math.abs(df.map(_.getDouble(3)).sum - d) < 1e-6, "sum(a) == d")
    df.groupBy(_.get(0)).values.foreach { rs =>
      val c = rs.head.getDouble(5)
      assert(math.abs(rs.map(_.getDouble(3)).sum - c) < 1e-6, "sum_d2(a) == c")
    }
    // and rca == (a/b)/(c/d) recomputed from the debug columns
    df.foreach { r =>
      val recomputed = (r.getDouble(3) / r.getDouble(4)) / (r.getDouble(5) / r.getDouble(6))
      assert(math.abs(r.getDouble(7) - recomputed) < 1e-12)
    }
  }

  test("rate is within (0,1] and the member share of the total") {
    val rows = planner.plan(spark, CubeQuery(
      drilldowns = Seq(drill("Return Flag.Return Flag")),
      measures = Seq(mea("Quantity")),
      rate = Some(RateQuery.parse("Geography.Region.0,1,2,3,4").fold(die, identity)))).collect()
    // cutting nothing out: rate of ALL members is exactly 1
    rows.foreach(r => assert(r.getDouble(2) == 1.0))
  }

  test("top-k under deliberate measure ties is invariant to input partitioning") {
    // every (group, item) sums to the same measure value, so top-2 per
    // group is decided ENTIRELY by the drill-column tiebreaker
    // (CubePlanner top window) — without it, row_number over tied sort keys
    // would pick partition-order-dependent winners and the same query could
    // return different rows on a different cluster layout
    import spark.implicits._
    val cube = Cube("Ties", TableDef("tiefact"), Seq(
      Dimension("Group", foreignKey = None,
        hierarchies = Seq(Hierarchy("Group", primaryKey = "grp",
          levels = Seq(Level("Group", "grp"))))),
      Dimension("Item", foreignKey = None,
        hierarchies = Seq(Hierarchy("Item", primaryKey = "item",
          levels = Seq(Level("Item", "item")))))),
      Seq(Measure("V", "v", Aggregator.Sum)))
    val fact = for {
      g <- Seq("a", "b", "c"); i <- 0 until 10; _ <- 0 until 3
    } yield (g, f"i$i%02d", 10.0)
    val q = CubeQuery(
      drilldowns = Seq(drill("Group.Group"), drill("Item.Item")),
      measures = Seq(mea("V")),
      top = Some(TopQuery.parse("2,Group.Group,V,desc").fold(die, identity)))
    val results = Seq(1, 3, 7, 32).map { n =>
      val resolver = new TableResolver {
        def resolve(s: org.apache.spark.sql.SparkSession, t: TableDef) =
          fact.toDF("grp", "item", "v").repartition(n)
      }
      new CubePlanner(cube, resolver).plan(spark, q)
        .collect().map(_.toSeq.toList).toList.sortBy(_.toString)
    }
    assert(results.distinct.size == 1,
      s"top-k must be partition-invariant under ties:\n${results.map(_.mkString("; ")).mkString("\n")}")
    // and the winners are the tiebreak-determined ones, not arbitrary
    val expect = (for (g <- Seq("a", "b", "c"); i <- Seq("i00", "i01"))
      yield List[Any](g, i, 30.0)).sortBy(_.toString)
    assert(results.head == expect, results.head.mkString("; "))
  }

  test("top-k result is a subset of the unrestricted result") {
    val full = planner.plan(spark, CubeQuery(
      drilldowns = Seq(drill("Geography.Region"), drill("Geography.Nation")),
      measures = Seq(mea("Quantity")))).collect()
      .map(_.toSeq.toList).toSet
    val top = planner.plan(spark, CubeQuery(
      drilldowns = Seq(drill("Geography.Region"), drill("Geography.Nation")),
      measures = Seq(mea("Quantity")),
      top = Some(TopQuery.parse("3,Geography.Region,Quantity,desc").fold(die, identity)))).collect()
    top.foreach(r => assert(full.contains(r.toSeq.toList)))
  }
}
