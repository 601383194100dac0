package graft.plan

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.engine.TpchStar
import graft.SparkTestSession.{spark, SfDir}

class LogicLayerSpec extends AnyFunSuite {

  private def die(m: String): Nothing = throw PlanError(m)
  private def drill(s: String) = Drilldown.parse(s).fold(die, identity)
  private def mea(s: String) = MeasureName.parse(s).fold(die, identity)
  private def cut(s: String) = CutSpec.parse(s).fold(die, identity)
  private def ln(s: String) = LevelName.parse(s).fold(die, identity)

  private val sets = Seq(NamedSet("two_regions", ln("Geography.Region"), Seq("1", "2")))
  private def ll = new LogicLayer(TpchStar.planner(SfDir), sets)

  test("fan-out: cuts on two levels of one dim produce one query per cut, cut level auto-drilled") {
    val q = LogicLayerQuery(
      drilldowns = Seq(drill("Ship Date.Year")),
      cuts = Seq(cut("Geography.Region.0"), cut("Geography.Nation.1,2")),
      measures = Seq(mea("Quantity")))
    val fanned = ll.fanOut(q, q.cuts)
    assert(fanned.length == 2)
    assert(fanned(0).drilldowns == Seq(drill("Ship Date.Year"), drill("Geography.Region")))
    assert(fanned(0).cuts == Seq(cut("Geography.Region.0")))
    assert(fanned(1).drilldowns == Seq(drill("Ship Date.Year"), drill("Geography.Nation")))
    assert(fanned(1).cuts == Seq(cut("Geography.Nation.1,2")))
  }

  test("fan-out: cuts across different dims stay one query") {
    val q = LogicLayerQuery(
      drilldowns = Seq(drill("Ship Date.Year")),
      cuts = Seq(cut("Geography.Region.0"), cut("Return Flag.Return Flag.A")),
      measures = Seq(mea("Quantity")))
    val fanned = ll.fanOut(q, q.cuts)
    assert(fanned.length == 1)
    assert(fanned.head.cuts.length == 2)
    assert(fanned.head.drilldowns == Seq(drill("Ship Date.Year")), "no auto-drill for single-level cuts")
  }

  test("fan-out: two multi-level dims multiply (cartesian)") {
    val q = LogicLayerQuery(
      cuts = Seq(
        cut("Geography.Region.0"), cut("Geography.Nation.1"),
        cut("Ship Date.Year.1995"), cut("Ship Date.Month.3")),
      measures = Seq(mea("Quantity")))
    assert(ll.fanOut(q, q.cuts).length == 4)
  }

  test("union result carries first plan's headers and re-sorts deterministically") {
    val df = ll.plan(spark, LogicLayerQuery(
      drilldowns = Seq(drill("Ship Date.Year")),
      cuts = Seq(cut("Geography.Region.0"), cut("Geography.Nation.1,2")),
      measures = Seq(mea("Quantity"))))
    assert(df.columns.toSeq == Seq("Year", "Region ID", "Region", "Quantity"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    def lnum(r: org.apache.spark.sql.Row, i: Int): Long = r.get(i).asInstanceOf[Number].longValue
    val sortedCopy = rows.sortBy(r => (lnum(r, 0), lnum(r, 1), r.getString(2), r.getDouble(3)))
    assert(rows.toSeq == sortedCopy.toSeq)
  }

  test("exclude drops result rows by ID") {
    val base = ll.plan(spark, LogicLayerQuery(
      drilldowns = Seq(drill("Geography.Nation")),
      measures = Seq(mea("Quantity"))))
    val excluded = ll.plan(spark, LogicLayerQuery(
      drilldowns = Seq(drill("Geography.Nation")),
      measures = Seq(mea("Quantity")),
      exclude = Seq(cut("Geography.Nation.12,20"))))
    def lnum(r: org.apache.spark.sql.Row): Long = r.get(0).asInstanceOf[Number].longValue
    val baseIds = base.collect().map(lnum).toSet
    val exIds = excluded.collect().map(lnum).toSet
    assert(baseIds.contains(12L) && baseIds.contains(20L), "fixture sanity")
    assert(exIds == baseIds -- Set(12L, 20L))
  }

  test("named set expands in cut position") {
    val viaSet = ll.plan(spark, LogicLayerQuery(
      drilldowns = Seq(drill("Geography.Nation")),
      cuts = Seq(CutSpec(ln("Geography.Region"), Seq("two_regions"))),
      measures = Seq(mea("Quantity")))).collect()
    val direct = ll.plan(spark, LogicLayerQuery(
      drilldowns = Seq(drill("Geography.Nation")),
      cuts = Seq(cut("Geography.Region.1,2")),
      measures = Seq(mea("Quantity")))).collect()
    assert(viaSet.map(_.toSeq).toSeq == direct.map(_.toSeq).toSeq)
  }

  test("time=latest cuts to the newest member") {
    val df = ll.plan(spark, LogicLayerQuery(
      drilldowns = Seq(drill("Ship Date.Year")),
      measures = Seq(mea("Quantity")),
      time = Some((ln("Ship Date.Year"), "latest"))))
    val rows = df.collect()
    assert(rows.length == 1)
    val maxYear = spark.read.parquet(s"$SfDir/lineitem.parquet")
      .selectExpr("max(year(l_shipdate))").head().getInt(0)
    assert(rows.head.getLong(0) == maxYear.toLong)
  }

  test("time=oldest cuts to the earliest member") {
    val df = ll.plan(spark, LogicLayerQuery(
      drilldowns = Seq(drill("Ship Date.Year")),
      measures = Seq(mea("Quantity")),
      time = Some((ln("Ship Date.Year"), "oldest"))))
    val rows = df.collect()
    assert(rows.length == 1)
    val minYear = spark.read.parquet(s"$SfDir/lineitem.parquet")
      .selectExpr("min(year(l_shipdate))").head().getInt(0)
    assert(rows.head.getLong(0) == minYear.toLong)
  }

  test("children cut op equals direct cut on the child members") {
    val viaOp = ll.plan(spark, LogicLayerQuery(
      drilldowns = Seq(drill("Geography.Nation")),
      cuts = Seq(CutSpec(ln("Geography.Region"), Seq("1:children"))),
      measures = Seq(mea("Quantity")))).collect()
    val direct = ll.plan(spark, LogicLayerQuery(
      drilldowns = Seq(drill("Geography.Nation")),
      cuts = Seq(cut("Geography.Region.1")),
      measures = Seq(mea("Quantity")))).collect()
    assert(viaOp.map(_.toSeq).toSeq == direct.map(_.toSeq).toSeq)
  }
}
