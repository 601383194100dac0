package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** XML reader tests over a Webshop-shaped fixture (the reference's e2e
  * schema, tests/src/clickhouse_end_to_end.rs). */
class SchemaXmlSpec extends AnyFunSuite {

  private val webshopXml =
    """<Schema name="Webshop">
      |  <SharedDimension name="Geography" type="geo">
      |    <Hierarchy name="Geography">
      |      <Table name="geographies" />
      |      <Level name="Continent" key_column="continent_id" name_column="continent_name" key_type="text">
      |        <Property name="Continent PT" column="continent_name_pt" caption_set="pt" />
      |      </Level>
      |      <Level name="Country" key_column="country_id" name_column="country_name" key_type="nontext" />
      |    </Hierarchy>
      |  </SharedDimension>
      |  <Cube name="Sales">
      |    <Table name="sales" />
      |    <DimensionUsage foreign_key="country_id" name="Geography" source="Geography" />
      |    <Dimension name="Year" foreign_key="year">
      |      <Hierarchy name="Year">
      |        <Level name="Year" key_column="year" />
      |      </Hierarchy>
      |    </Dimension>
      |    <Dimension name="Category" foreign_key="category_id">
      |      <Hierarchy name="Category">
      |        <InlineTable alias="categories">
      |          <ColumnDef name="category_name" key_type="text" />
      |          <ColumnDef name="category_idx" key_type="nontext" key_column_type="Int32" />
      |          <Row>
      |            <Value column="category_name">Books</Value>
      |            <Value column="category_idx">1</Value>
      |          </Row>
      |          <Row>
      |            <Value column="category_name">Sports</Value>
      |            <Value column="category_idx">2</Value>
      |          </Row>
      |        </InlineTable>
      |        <Level name="Category" key_column="category_idx" name_column="category_name" key_type="nontext" />
      |      </Hierarchy>
      |    </Dimension>
      |    <Measure name="Price Total" column="price_total" aggregator="sum" />
      |    <Measure name="Quantity" column="quantity" aggregator="sum" />
      |    <Measure name="WQ" column="quantity" aggregator="weighted_sum" weight_column="w" />
      |    <Measure name="UC" column="customer_id" aggregator="approx_distinct" k="32" />
      |  </Cube>
      |</Schema>""".stripMargin

  test("webshop-shaped XML parses to the full model") {
    val s = SchemaXml.parse(webshopXml)
    assert(s.name == "Webshop")
    val c = s.cube("Sales").get
    assert(c.table == TableDef("sales"))
    assert(c.dimensions.map(_.name) == Seq("Year", "Category", "Geography"))

    val geo = c.dimensions.find(_.name == "Geography").get
    assert(geo.isShared && geo.foreignKey.contains("country_id"))
    assert(geo.dimType == DimensionType.Geo)
    val continent = geo.hierarchies.head.levels.head
    assert(continent.properties == Seq(PropertyDef("Continent PT", "continent_name_pt", Some("pt"))))
    assert(geo.hierarchies.head.levels(1).keyType == MemberType.NonText)

    val cat = c.dimensions.find(_.name == "Category").get
    val it = cat.hierarchies.head.inlineTable.get
    assert(it.alias == "categories")
    assert(it.columns.map(_.name) == Seq("category_name", "category_idx"))
    assert(it.columns(1).castType.contains("Int32"))
    assert(it.rows == Seq(Seq("Books", "1"), Seq("Sports", "2")))
    // hierarchy primary_key defaults to the lowest level's key column
    assert(cat.hierarchies.head.primaryKey == "category_idx")

    assert(c.measures.map(_.name) == Seq("Price Total", "Quantity", "WQ", "UC"))
    assert(c.measures(2).aggregator == Aggregator.WeightedSum("w"))
    assert(c.measures(3).aggregator == Aggregator.ApproxDistinct(32))
  }

  test("XML and JSON readers produce the same model for the same schema") {
    val json =
      """{"name": "S", "cubes": [{"name": "C", "table": {"name": "fact"},
        |  "dimensions": [{"name": "D", "foreign_key": "fk", "hierarchies": [{
        |    "name": "D", "table": {"name": "dim"}, "primary_key": "id",
        |    "levels": [{"name": "L", "key_column": "k", "name_column": "n"}]}]}],
        |  "measures": [{"name": "M", "column": "m", "aggregator": "sum"}]}]}""".stripMargin
    val xml =
      """<Schema name="S">
        |  <Cube name="C">
        |    <Table name="fact" />
        |    <Dimension name="D" foreign_key="fk">
        |      <Hierarchy name="D" primary_key="id">
        |        <Table name="dim" />
        |        <Level name="L" key_column="k" name_column="n" />
        |      </Hierarchy>
        |    </Dimension>
        |    <Measure name="M" column="m" aggregator="sum" />
        |  </Cube>
        |</Schema>""".stripMargin
    assert(SchemaXml.parse(xml) == SchemaJson.parse(json))
  }

  test("XML validation failures surface") {
    intercept[SchemaJson.SchemaError] { SchemaXml.parse("<Schema name=\"S\"></Schema>") }
    intercept[SchemaJson.SchemaError] {
      SchemaXml.parse(
        """<Schema name="S"><Cube name="C"><Table name="f"/>
          |<Measure name="M" column="m" aggregator="sum"/></Cube></Schema>""".stripMargin)
    }
  }
}
