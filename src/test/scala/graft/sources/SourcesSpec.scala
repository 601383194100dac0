package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.engine.TpchStar
import graft.plan.{CubePlanner, PlanError}
import graft.SparkTestSession.{spark, SfDir}

/** The same cube query must answer identically whatever storage format the
  * resolver binds — the Spark analogue of the reference running one schema
  * against clickhouse/mysql/postgres backends. */
class SourcesSpec extends AnyFunSuite {

  private def die(m: String): Nothing = throw PlanError(m)
  private def drill(s: String) = Drilldown.parse(s).fold(die, identity)
  private def mea(s: String) = MeasureName.parse(s).fold(die, identity)

  private val q = CubeQuery(
    drilldowns = Seq(drill("Geography.Region")),
    measures = Seq(mea("Quantity"), mea("Row Count")))

  // minimal cube whose fact + snowflake dim resolve through the bindings
  private val cube = Cube("SalesFmt", TableDef("lineitem"), Seq(
    Dimension("Geography", foreignKey = Some("l_suppkey"),
      hierarchies = Seq(Hierarchy("Geography",
        table = Some(TableDef("supplier_geo", primaryKey = Some("s_suppkey"))),
        primaryKey = "s_suppkey",
        levels = Seq(Level("Region", "r_regionkey", nameColumn = Some("r_name"),
          keyType = MemberType.NonText)))))),
    Seq(Measure("Quantity", "l_quantity", Aggregator.Sum),
      Measure("Row Count", "l_orderkey", Aggregator.Count)))

  private def result(planner: CubePlanner): Seq[(Long, String, Double, Long)] =
    planner.plan(spark, q).collect()
      .map(r => (r.get(0).asInstanceOf[Number].longValue, r.getString(1),
        r.get(2).asInstanceOf[Number].doubleValue, r.get(3).asInstanceOf[Number].longValue))
      .toSeq

  test("csv and json fact sources answer identically to parquet") {
    val tmp = Files.createTempDirectory("graft_sources").toString
    val li = spark.read.parquet(s"$SfDir/lineitem.parquet")
      .select("l_orderkey", "l_suppkey", "l_quantity")
    li.write.mode("overwrite").option("header", "true").csv(s"$tmp/lineitem_csv")
    li.write.mode("overwrite").json(s"$tmp/lineitem_json")

    import org.apache.spark.sql.functions.col
    val geo = spark.read.parquet(s"$SfDir/supplier.parquet")
      .join(spark.read.parquet(s"$SfDir/nation.parquet"),
        col("s_nationkey") === col("n_nationkey"))
      .join(spark.read.parquet(s"$SfDir/region.parquet"),
        col("n_regionkey") === col("r_regionkey"))
    geo.write.mode("overwrite").parquet(s"$tmp/supplier_geo")

    val liDdl = "l_orderkey BIGINT, l_suppkey BIGINT, l_quantity DOUBLE"
    def planner(fact: SourceSpec) = new CubePlanner(cube, new FormatResolver(Map(
      "lineitem"     -> fact,
      "supplier_geo" -> SourceSpec(s"$tmp/supplier_geo"))))

    val fromCsv = result(planner(SourceSpec(s"$tmp/lineitem_csv", "csv",
      Map("header" -> "true"), Some(liDdl))))
    val fromJson = result(planner(SourceSpec(s"$tmp/lineitem_json", "json",
      schemaDdl = Some(liDdl))))
    val fromParquet = result(new CubePlanner(cube,
      new FormatResolver(Map("supplier_geo" -> SourceSpec(s"$tmp/supplier_geo")),
        fallbackParquetDir = Some(SfDir))))

    assert(fromCsv == fromParquet)
    assert(fromJson == fromParquet)
    assert(fromParquet.nonEmpty)
  }

  test("unbound table without fallback is a PlanError") {
    val r = new FormatResolver(Map.empty)
    intercept[PlanError] { r.resolve(spark, TableDef("nope")) }
  }

  test("bucketed tables join without any exchange; results match the shuffled join") {
    import org.apache.spark.sql.functions.{col, sum}
    val tmp = Files.createTempDirectory("graft_bucket").toString
    val li = spark.read.parquet(s"$SfDir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val ord = spark.read.parquet(s"$SfDir/orders.parquet")
      .select("o_orderkey", "o_custkey")
    Bucketing.writeBucketed(li, "li_b", s"$tmp/li", Seq("l_orderkey"), 8)
    Bucketing.writeBucketed(ord, "ord_b", s"$tmp/ord", Seq("o_orderkey"), 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the non-broadcast path
    try {
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan.take(500))
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n${plan.take(1500)}")
      val got = joined.agg(sum("l_quantity")).head().getDouble(0)
      val want = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .agg(sum("l_quantity")).head().getDouble(0)
      assert(got == want)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b"); spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }

  test("sink writes a lang-partitioned corpus that reads back complete") {
    val tmp = Files.createTempDirectory("graft_sink").toString
    val docs = spark.read.parquet(s"$SfDir/documents.parquet")
    Sinks.write(docs, s"$tmp/corpus", partitionBy = Seq("lang"))
    val back = spark.read.parquet(s"$tmp/corpus")
    assert(back.count() == docs.count())
    // partition pruning: a lang filter must prune to that partition's rows
    val en = docs.where("lang = 'en'").count()
    assert(back.where("lang = 'en'").count() == en)
    assert(Files.list(java.nio.file.Paths.get(s"$tmp/corpus")).toArray
      .map(_.toString).exists(_.contains("lang=")), "hive-style partition dirs")
  }
}
