package graft.plan

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.engine.TpchStar
import graft.SparkTestSession.{spark, SfDir}

class PreaggSpec extends AnyFunSuite {

  private def die(m: String): Nothing = throw PlanError(m)
  private def drill(s: String) = Drilldown.parse(s).fold(die, identity)
  private def mea(s: String) = MeasureName.parse(s).fold(die, identity)
  private def cut(s: String) = CutSpec.parse(s).fold(die, identity)

  private val base = TpchStar.planner(SfDir)
  private val grain = Seq(
    LevelName("Geography", "Geography", "Nation"),
    LevelName("Ship Date", "Ship Date", "Year"))

  private lazy val (pp, summaryPath): (PreaggPlanner, String) = {
    val path = Files.createTempDirectory("graft_preagg").toString + "/sales_nation_year"
    Preagg.materialize(spark, base, TpchStar.salesCube, grain, path)
    val derived = Preagg.derivedCube(TpchStar.salesCube, grain, TableDef("__summary"))
    val resolver = new graft.sources.FormatResolver(Map("__summary" -> graft.sources.SourceSpec(path)))
    (new PreaggPlanner(base, new CubePlanner(derived, resolver)), path)
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("summary is dim-cardinality, carries ancestors, and answers the grain query exactly") {
    val nFact = spark.read.parquet(s"$SfDir/lineitem.parquet").count()
    val nSummary = spark.read.parquet(summaryPath).count()
    assert(nSummary < nFact / 10, s"summary ($nSummary) must be far below fact grain ($nFact)")
    val q = CubeQuery(
      drilldowns = Seq(drill("Geography.Nation"), drill("Ship Date.Year")),
      measures = Seq(mea("Quantity"), mea("Row Count")))
    assert(rows(pp.plan(spark, q)) == rows(base.plan(spark, q)))
  }

  test("rollup above the grain (Region) and cuts route to the summary and match the base fact") {
    val q = CubeQuery(
      drilldowns = Seq(drill("Geography.Region")),
      cuts = Seq(cut("Ship Date.Year.1996,1997")),
      measures = Seq(mea("Quantity"), mea("Max Price")))
    val viaSummary = pp.plan(spark, q)
    assert(rows(viaSummary) == rows(base.plan(spark, q)))
    // prove it actually read the summary, not the fact
    val scan = viaSummary.queryExecution.executedPlan.toString
    assert(scan.contains("sales_nation_year"), "plan must scan the summary parquet")
    assert(!scan.contains("lineitem.parquet"), "plan must not scan the fact")
  }

  test("below-grain drills and non-reaggregable measures fall back to the base fact") {
    val below = CubeQuery(
      drilldowns = Seq(drill("Geography.Supplier")),
      measures = Seq(mea("Quantity")))
    assert(rows(pp.plan(spark, below)) == rows(base.plan(spark, below)))

    val median = CubeQuery(
      drilldowns = Seq(drill("Return Flag.Return Flag")),
      measures = Seq(mea("Median Order Quantity")))
    val viaPp = pp.plan(spark, median)
    assert(rows(viaPp) == rows(base.plan(spark, median)))
    assert(viaPp.queryExecution.executedPlan.toString.contains("lineitem.parquet"))
  }

  test("top-k and filters work unchanged through the summary") {
    val q = CubeQuery(
      drilldowns = Seq(drill("Geography.Region"), drill("Geography.Nation")),
      measures = Seq(mea("Quantity")),
      top = Some(TopQuery.parse("2,Geography.Region,Quantity,desc").fold(die, identity)))
    assert(rows(pp.plan(spark, q)) == rows(base.plan(spark, q)))
  }

  test("non-reaggregable aggregators are excluded from the derived cube") {
    val derived = Preagg.derivedCube(TpchStar.salesCube, grain, TableDef("s"))
    val aggs = derived.measures.map(_.aggregator).toSet
    assert(aggs.subsetOf(Set[Aggregator](Aggregator.Sum, Aggregator.Min, Aggregator.Max)))
    assert(derived.measure("Median Order Quantity").isEmpty)
    assert(derived.measure("Revenue").isEmpty)
    assert(derived.measure("Quantity").isDefined)
  }
}
