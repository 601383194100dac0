package graft.plan

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.engine.TpchStar
import graft.fuzz.QueryFuzzer
import graft.SparkTestSession.{spark, SfDir}

/** Negative fuzzing: every user-input-reachable failure must surface as a
  * TYPED error — a parse `Left` or a `PlanError` — never an unclassified
  * exception. The server maps PlanError to HTTP 400 and anything else to
  * 500 (GraftServer's catch), and the reference rejects all of these as
  * bad requests (400), so an escape here is both a robustness and a
  * fidelity bug. The corpus is the valid seed-42 grammar corpus with one
  * structural mutation applied per case. */
class NegativeFuzzSpec extends AnyFunSuite {

  private def parsed[A](e: Either[String, A]): A =
    e.fold(m => throw PlanError(m), identity)

  /** Mutations of a valid query; each returns Some(bad query) when the
    * mutation applies to this query's shape, None to skip. */
  private val mutations: Seq[(String, CubeQuery => Option[CubeQuery])] = Seq(
    "unknown drilldown level" -> (q =>
      Some(q.copy(drilldowns = q.drilldowns :+ parsed(Drilldown.parse("Bogus.Level"))))),
    "unknown measure" -> (q =>
      Some(q.copy(measures = q.measures :+ parsed(MeasureName.parse("Bogus Measure"))))),
    "cut on unknown level" -> (q =>
      Some(q.copy(cuts = q.cuts :+ parsed(CutSpec.parse("Bogus.Level.1"))))),
    "sort on a measure not in the query" -> (q =>
      Some(q.copy(sort = Some(parsed(SortQuery.parse("Extended Price.desc")))))
        .filterNot(_ => q.measures.exists(_.name == "Extended Price"))),
    "sort on an unknown measure" -> (q =>
      Some(q.copy(sort = Some(parsed(SortQuery.parse("Bogus.desc")))))),
    "filter on an unknown measure" -> (q =>
      Some(q.copy(filters = q.filters :+ parsed(FilterQuery.parse("Bogus.gt.1"))))),
    "sort on rca calc without rca" -> (q =>
      if (q.rca.isDefined) None
      else Some(q.copy(sort = Some(parsed(SortQuery.parse("rca.desc")))))),
    "filter on growth calc without growth" -> (q =>
      if (q.growth.isDefined) None
      else Some(q.copy(filters = q.filters :+ parsed(FilterQuery.parse("growth.gt.0"))))),
    "growth measure not in measures" -> (q =>
      q.growth.map(g => q.copy(growth =
        Some(g.copy(mea = parsed(MeasureName.parse("Bogus"))))))),
    "top by a non-drilled level" -> (q => {
      // rca's drill_1/drill_2 are output levels too — valid top targets
      val drilled = (q.drilldowns.map(_.levelName) ++
        q.rca.toSeq.flatMap(r => Seq(r.drill1.levelName, r.drill2.levelName))).toSet
      val spare = Seq("Line Status.Line Status", "Customer.Segment", "Part.Brand")
        .map(s => parsed(LevelName.parse(s)))
        .find(!drilled.contains(_))
      spare.map(ln => q.copy(top = Some(TopQuery(2, ln,
        Seq(MeaOrCalc.Mea(q.measures.head)), SortDirection.Desc))))
    }),
    "top sorted by an unknown measure" -> (q =>
      if (q.drilldowns.isEmpty) None
      else Some(q.copy(top = Some(TopQuery(2, q.drilldowns.head.levelName,
        Seq(MeaOrCalc.Mea(parsed(MeasureName.parse("Bogus")))), SortDirection.Desc))))),
    "top_where on an unknown measure" -> (q =>
      if (q.drilldowns.isEmpty) None
      else Some(q.copy(
        top = Some(TopQuery(2, q.drilldowns.head.levelName,
          Seq(MeaOrCalc.Mea(q.measures.head)), SortDirection.Desc)),
        topWhere = Some(parsed(TopWhereQuery.parse("Bogus,gt.1")))))),
    "property on an unknown level" -> (q =>
      Some(q.copy(properties = q.properties :+ parsed(PropertyName.parse("Bogus.Level.Prop"))))),
    "property not declared on the level" -> (q =>
      Some(q.copy(properties = q.properties :+ parsed(PropertyName.parse("Geography.Nation.Bogus"))))),
    "no measures" -> (q => Some(q.copy(measures = Nil))),
    "no drilldowns or cuts" -> (q =>
      if (q.rca.isDefined || q.rate.isDefined) None
      else Some(q.copy(drilldowns = Nil, cuts = Nil))))

  test("every mutated invalid query fails with PlanError, never an unclassified exception") {
    val planner = TpchStar.planner(SfDir)
    val corpus = QueryFuzzer.cases(40).map(_.query) ++
      QueryFuzzer.rcaCases(10).map(_.query) ++
      QueryFuzzer.rateCases(10).map(_.query)
    var applied = 0
    val escapes = corpus.zipWithIndex.flatMap { case (valid, i) =>
      mutations.zipWithIndex.flatMap { case ((label, mutate), j) =>
        // one mutation per (case, mutation) diagonal stripe keeps the count
        // bounded while every mutation kind hits many distinct base shapes
        if ((i + j) % 4 != 0) None
        else mutate(valid).flatMap { bad =>
          applied += 1
          try {
            planner.plan(spark, bad)
            Some(s"case $i '$label': planned successfully (expected PlanError)")
          } catch {
            case _: PlanError => None
            case e: Throwable =>
              Some(s"case $i '$label': escaped as ${e.getClass.getName}: ${String.valueOf(e.getMessage).take(120)}")
          }
        }
      }
    }
    assert(escapes.isEmpty, s"${escapes.length} escapes:\n${escapes.mkString("\n")}")
    assert(applied > 100, s"only $applied mutations applied")
  }

  test("malformed spellings are rejected at parse time (Left, not an exception)") {
    assert(LevelName.parse("a.b.c.d.e").isLeft)
    assert(LevelName.parse("").isLeft)
    assert(CutSpec.parse("").isLeft)
    assert(TopQuery.parse("1,2").isLeft)
    assert(TopQuery.parse("x,Geography.Nation,Quantity,desc").isLeft)
    assert(TopQuery.parse("2,Geography.Nation,Quantity,sideways").isLeft)
    assert(FilterQuery.parse("Quantity").isLeft)
    assert(FilterQuery.parse("Quantity.zz.3").isLeft)
    assert(FilterQuery.parse("Quantity.gt.notanumber").isLeft)
    assert(SortQuery.parse("nodots").isLeft)
    assert(SortQuery.parse("Quantity.sideways").isLeft)
    assert(LimitQuery.parse("x").isLeft)
    assert(GrowthQuery.parse("onlyonepart").isLeft)
    assert(RcaQuery.parse("a,b").isLeft)
    assert(RateQuery.parse("OnlyLevel").isLeft)
    assert(Constraint.parse("gt.").isLeft)
  }
}
