package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Option-grammar tests: the reference's filter tests
  * (tesseract-core/src/query.rs:562-603) plus the full option surface
  * (top/top_where/sort/limit/growth/rca/rate) and the negative-threshold
  * cases (growth is routinely negative — query.rs:205-223). */
class QuerySpec extends AnyFunSuite {

  private val hello = MeaOrCalc.Mea(MeasureName("Hello"))

  test("simple eq filter with decimal value (query.rs test_simple_filter)") {
    assert(FilterQuery.parse("Hello.eq.45.2") ==
      Right(FilterQuery(hello, Constraint(Comparison.Eq, 45.2))))
  }

  test("gt filter with leading-dot float (query.rs test_simple_gt_filter)") {
    assert(FilterQuery.parse("Hello.gt..2") ==
      Right(FilterQuery(hello, Constraint(Comparison.Gt, 0.2))))
  }

  test("negative thresholds parse") {
    assert(Constraint.parse("gt.-5") == Right(Constraint(Comparison.Gt, -5.0)))
    assert(Constraint.parse("lt.-0.5") == Right(Constraint(Comparison.Lt, -0.5)))
  }

  test("all comparison spellings") {
    for ((s, c) <- Seq("eq" -> Comparison.Eq, "neq" -> Comparison.Neq,
        "lt" -> Comparison.Lt, "lte" -> Comparison.Lte,
        "gt" -> Comparison.Gt, "gte" -> Comparison.Gte))
      assert(Comparison.parse(s) == Right(c))
    assert(Comparison.parse("xx").isLeft)
  }

  test("compound filter with .and. / .or.") {
    val f = FilterQuery.parse("Hello.gt.60000.and.lt.100000000").toOption.get
    assert(f.byMeaOrCalc == hello)
    assert(f.constraint == Constraint(Comparison.Gt, 60000))
    assert(f.operator.contains(FilterOp.And))
    assert(f.constraint2.contains(Constraint(Comparison.Lt, 100000000)))

    val g = FilterQuery.parse("Hello.lt.5.or.gt.10").toOption.get
    assert(g.operator.contains(FilterOp.Or))
  }

  test("rca/growth are reserved calc names in measure position") {
    assert(MeaOrCalc.parse("rca") == Right(MeaOrCalc.RcaCalc))
    assert(MeaOrCalc.parse("growth") == Right(MeaOrCalc.GrowthCalc))
    assert(MeaOrCalc.parse("Quantity") == Right(MeaOrCalc.Mea(MeasureName("Quantity"))))
  }

  test("top query: n, by-level, measure, direction") {
    val t = TopQuery.parse("2,Geography.Region,Quantity,desc").toOption.get
    assert(t.n == 2)
    assert(t.byDimension == LevelName("Geography", "Geography", "Region"))
    assert(t.sortMeaOrCalc == Seq(MeaOrCalc.Mea(MeasureName("Quantity"))))
    assert(t.sortDirection == SortDirection.Desc)
    assert(TopQuery.parse("x,A.B,m,desc").isLeft)
    assert(TopQuery.parse("1,A.B,m").isLeft)
  }

  test("top_where query") {
    val tw = TopWhereQuery.parse("Quantity,gt.50000").toOption.get
    assert(tw.byMeaOrCalc == MeaOrCalc.Mea(MeasureName("Quantity")))
    assert(tw.constraint == Constraint(Comparison.Gt, 50000))
  }

  test("sort query splits on last dot") {
    assert(SortQuery.parse("Quantity.desc") ==
      Right(SortQuery(SortDirection.Desc, MeaOrCalc.Mea(MeasureName("Quantity")))))
    assert(SortQuery.parse("rca.asc") ==
      Right(SortQuery(SortDirection.Asc, MeaOrCalc.RcaCalc)))
    assert(SortQuery.parse("nodot").isLeft)
  }

  test("limit query: n and offset,n") {
    assert(LimitQuery.parse("5") == Right(LimitQuery(None, 5)))
    assert(LimitQuery.parse("3,7") == Right(LimitQuery(Some(3), 7)))
    assert(LimitQuery.parse("a,b").isLeft)
  }

  test("growth query: time level + measure") {
    val g = GrowthQuery.parse("Ship Date.Year,Quantity").toOption.get
    assert(g.timeDrill == Drilldown(LevelName("Ship Date", "Ship Date", "Year")))
    assert(g.mea == MeasureName("Quantity"))
    assert(GrowthQuery.parse("onlyonepart").isLeft)
  }

  test("rca query: two drills + measure") {
    val r = RcaQuery.parse("Geography.Nation,Part.Brand,Quantity").toOption.get
    assert(r.drill1 == Drilldown(LevelName("Geography", "Geography", "Nation")))
    assert(r.drill2 == Drilldown(LevelName("Part", "Part", "Brand")))
    assert(r.mea == MeasureName("Quantity"))
  }

  test("rate query: level + member list") {
    val r = RateQuery.parse("Geography.Region.0,2").toOption.get
    assert(r.levelName == LevelName("Geography", "Geography", "Region"))
    assert(r.values == Seq("0", "2"))
    assert(RateQuery.parse("TooFew").isLeft)
    assert(RateQuery.parse("a.b.c.d.e").isLeft)
  }
}
