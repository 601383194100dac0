package graft.core

import org.scalatest.funsuite.AnyFunSuite

class SchemaJsonSpec extends AnyFunSuite {

  private def cubeJson(dims: String, measures: String = defaultMeasures): String =
    s"""{"name": "S", "cubes": [{"name": "C", "table": {"name": "fact"},
       |  "dimensions": $dims, "measures": $measures}]}""".stripMargin
  private val defaultMeasures = """[{"name": "M", "column": "m", "aggregator": "sum"}]"""
  private val geoDim =
    """[{"name": "Geo", "foreign_key": "fk", "hierarchies": [{
      |  "name": "Geo", "table": {"name": "geo"}, "primary_key": "id",
      |  "levels": [{"name": "Region", "key_column": "r", "name_column": "rn"}]}]}]""".stripMargin

  test("minimal schema parses") {
    val s = SchemaJson.parse(cubeJson(geoDim))
    assert(s.name == "S")
    val c = s.cube("C").get
    assert(c.table == TableDef("fact"))
    assert(c.dimensions.head.foreignKey.contains("fk"))
    assert(c.dimensions.head.hierarchies.head.levels.head.nameColumn.contains("rn"))
    assert(c.measures == Seq(Measure("M", "m", Aggregator.Sum)))
  }

  test("derived_from_column parses into the pushdown declaration") {
    val dims =
      """[{"name": "Time", "hierarchies": [{
        |  "name": "Time", "primary_key": "y",
        |  "levels": [{"name": "Year", "key_column": "y", "key_type": "nontext",
        |              "derived_from_column": "ship_ts"}]}]}]""".stripMargin
    val lvl = SchemaJson.parse(cubeJson(dims)).cube("C").get
      .dimensions.head.hierarchies.head.levels.head
    assert(lvl.derivedFrom.contains(DerivedFrom("ship_ts", "year")))
  }

  test("aggregator string forms") {
    for ((s, a) <- Seq("sum" -> Aggregator.Sum, "count" -> Aggregator.Count,
        "avg" -> Aggregator.Avg, "max" -> Aggregator.Max, "min" -> Aggregator.Min)) {
      val ms = s"""[{"name": "M", "column": "m", "aggregator": "$s"}]"""
      assert(SchemaJson.parse(cubeJson(geoDim, ms)).cube("C").get.measures.head.aggregator == a)
    }
  }

  test("parameterized aggregator objects") {
    val ms =
      """[{"name": "W", "column": "m", "aggregator": {"weighted_avg_typo_guard": 0, "weighted_average": {"weight_column": "w"}}},
        | {"name": "MOE", "column": "m", "aggregator": {"moe": {"critical_value": 1.645}}},
        | {"name": "GM", "column": "m", "aggregator": {"basic_grouped_median": {"group_aggregator": "sum", "group_dimension": "D.D.L"}}}]""".stripMargin
    val c = SchemaJson.parse(cubeJson(geoDim, ms)).cube("C").get
    assert(c.measures(0).aggregator == Aggregator.WeightedAvg("w"))
    assert(c.measures(1).aggregator == Aggregator.Moe(1.645))
    assert(c.measures(2).aggregator == Aggregator.BasicGroupedMedian("sum", "D.D.L"))
  }

  test("shared dimensions instantiate through dimension_usages") {
    val json =
      """{"name": "S",
        | "shared_dimensions": [{"name": "Geo", "hierarchies": [{
        |    "name": "Geo", "table": {"name": "geo"}, "primary_key": "id",
        |    "levels": [{"name": "R", "key_column": "r"}]}]}],
        | "cubes": [{"name": "C", "table": {"name": "fact"},
        |   "dimension_usages": [{"source": "Geo", "foreign_key": "fk"}],
        |   "measures": [{"name": "M", "column": "m", "aggregator": "sum"}]}]}""".stripMargin
    val c = SchemaJson.parse(json).cube("C").get
    assert(c.dimensions.length == 1)
    assert(c.dimensions.head.name == "Geo")
    assert(c.dimensions.head.foreignKey.contains("fk"))
    assert(c.dimensions.head.isShared)
  }

  test("validation: cube without dimensions fails") {
    intercept[SchemaJson.SchemaError] { SchemaJson.parse(cubeJson("[]")) }
  }

  test("validation: duplicate dimension names fail") {
    val dims =
      """[{"name": "D", "foreign_key": "a", "hierarchies": [{"name": "D", "primary_key": "k", "levels": [{"name": "L", "key_column": "k"}]}]},
        | {"name": "D", "foreign_key": "b", "hierarchies": [{"name": "D", "primary_key": "k", "levels": [{"name": "L", "key_column": "k"}]}]}]""".stripMargin
    intercept[SchemaJson.SchemaError] { SchemaJson.parse(cubeJson(dims)) }
  }

  test("validation: multi-hierarchy dim requires default_hierarchy; single-hierarchy default cleared") {
    val multi =
      """[{"name": "D", "foreign_key": "a", "hierarchies": [
        |  {"name": "H1", "primary_key": "k", "levels": [{"name": "L", "key_column": "k"}]},
        |  {"name": "H2", "primary_key": "k", "levels": [{"name": "L", "key_column": "k"}]}]}]""".stripMargin
    intercept[SchemaJson.SchemaError] { SchemaJson.parse(cubeJson(multi)) }

    val single =
      """[{"name": "D", "foreign_key": "a", "default_hierarchy": "H1", "hierarchies": [
        |  {"name": "H1", "primary_key": "k", "levels": [{"name": "L", "key_column": "k"}]}]}]""".stripMargin
    val c = SchemaJson.parse(cubeJson(single)).cube("C").get
    assert(c.dimensions.head.defaultHierarchy.isEmpty, "single-hierarchy default must be cleared (lib.rs:120-130)")
  }

  test("inline tables parse with typed columns") {
    val dims =
      """[{"name": "D", "foreign_key": "a", "hierarchies": [{
        |  "name": "D", "primary_key": "id",
        |  "inline_table": {"alias": "t",
        |    "column_definitions": [
        |      {"name": "id", "key_type": "nontext", "key_column_type": "Int32"},
        |      {"name": "label", "key_type": "text"}],
        |    "rows": [{"row_values": ["1", "one"]}, {"row_values": ["2", "two"]}]},
        |  "levels": [{"name": "L", "key_column": "id", "name_column": "label"}]}]}]""".stripMargin
    val h = SchemaJson.parse(cubeJson(dims)).cube("C").get.dimensions.head.hierarchies.head
    assert(h.inlineTable.isDefined)
    assert(h.inlineTable.get.columns.map(_.name) == Seq("id", "label"))
    assert(h.inlineTable.get.columns.head.castType.contains("Int32"))
    assert(h.inlineTable.get.rows == Seq(Seq("1", "one"), Seq("2", "two")))
  }
}
