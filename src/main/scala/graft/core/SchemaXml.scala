package graft.core

import scala.xml.{Elem, Node, XML}

/** XML schema reader, wire-compatible with the reference's Mondrian-style
  * XML config (tesseract-core/src/schema/xml.rs:21-169; concrete shape:
  * tests/src/clickhouse_end_to_end.rs Webshop fixture): scalar fields are
  * attributes, nested structures are child elements, inline-table rows are
  * `<Row><Value column="c">v</Value></Row>`.
  *
  * The reference funnels XML through a JSON intermediary (lib.rs:82-91);
  * here both readers build the same case-class model and share
  * [[SchemaJson.validate]].
  */
object SchemaXml {
  import SchemaJson.SchemaError
  private def fail(m: String): Nothing = throw SchemaError(m)

  def parse(xml: String): Schema = {
    val root = XML.loadString(xml)
    if (root.label != "Schema") fail(s"root element must be <Schema>, got <${root.label}>")
    val shared = (root \ "SharedDimension").map(parseDimension(_, sharedDim = true))
    val cubes = (root \ "Cube").toList match {
      case Nil => fail("schema must declare at least one cube")
      case cs  => cs.map(parseCube(_, shared))
    }
    SchemaJson.validate(Schema(
      name = attr(root, "name").getOrElse(fail("schema needs a name")),
      cubes = cubes,
      annotations = annotations(root),
      defaultLocale = attr(root, "default_locale")))
  }

  // --------------------------------------------------------------- helpers

  private def attr(n: Node, name: String): Option[String] =
    n.attribute(name).map(_.text).filter(_.nonEmpty)

  private def annotations(n: Node): Seq[Annotation] =
    (n \ "Annotation").flatMap { a =>
      attr(a, "name").map(nm => Annotation(nm, a.text.trim))
    }

  private def parseTable(n: Node): TableDef = TableDef(
    name = attr(n, "name").getOrElse(fail("Table needs a name")),
    schema = attr(n, "schema"),
    primaryKey = attr(n, "primary_key"))

  private def parseCube(n: Node, shared: Seq[Dimension]): Cube = {
    val own = (n \ "Dimension").map(parseDimension(_, sharedDim = false))
    val used = (n \ "DimensionUsage").map { u =>
      val source = attr(u, "source").getOrElse(fail("DimensionUsage needs a source"))
      val base = shared.find(_.name == source)
        .getOrElse(fail(s"shared dimension '$source' not found"))
      base.copy(
        name = attr(u, "name").getOrElse(source),
        foreignKey = Some(attr(u, "foreign_key").getOrElse(fail("DimensionUsage needs a foreign_key"))),
        isShared = true)
    }
    Cube(
      name = attr(n, "name").getOrElse(fail("Cube needs a name")),
      table = (n \ "Table").headOption.map(parseTable).getOrElse(fail("Cube needs a <Table>")),
      dimensions = own ++ used,
      measures = (n \ "Measure").map(parseMeasure),
      public = attr(n, "public").forall(_.toBoolean),
      minAuthLevel = attr(n, "min_auth_level").map(_.toInt).getOrElse(0),
      annotations = annotations(n))
  }

  private def parseDimension(n: Node, sharedDim: Boolean): Dimension = Dimension(
    name = attr(n, "name").getOrElse(fail("Dimension needs a name")),
    foreignKey = attr(n, "foreign_key"),
    hierarchies = (n \ "Hierarchy").map(parseHierarchy),
    defaultHierarchy = attr(n, "default_hierarchy"),
    dimType = attr(n, "type").map(DimensionType.parse).getOrElse(DimensionType.Standard),
    isShared = sharedDim,
    annotations = annotations(n))

  private def parseHierarchy(n: Node): Hierarchy = {
    val levels = (n \ "Level").map(parseLevel)
    Hierarchy(
      name = attr(n, "name").getOrElse(fail("Hierarchy needs a name")),
      table = (n \ "Table").headOption.map(parseTable),
      inlineTable = (n \ "InlineTable").headOption.map(parseInlineTable),
      primaryKey = attr(n, "primary_key")
        .orElse(levels.lastOption.map(_.keyColumn))
        .getOrElse(fail("Hierarchy needs a primary_key or levels")),
      levels = levels,
      defaultMember = attr(n, "default_member"),
      annotations = annotations(n))
  }

  private def parseInlineTable(n: Node): InlineTable = {
    val columns = (n \ "ColumnDef").map { c =>
      InlineColumn(
        name = attr(c, "name").getOrElse(fail("ColumnDef needs a name")),
        columnType = attr(c, "key_type").map(MemberType.parse).getOrElse(MemberType.Text),
        castType = attr(c, "key_column_type"),
        captionSet = attr(c, "caption_set"))
    }
    val rows = (n \ "Row").map { r =>
      val byCol = (r \ "Value").flatMap(v => attr(v, "column").map(_ -> v.text)).toMap
      columns.map(c => byCol.getOrElse(c.name, fail(s"Row missing value for column '${c.name}'")))
    }
    InlineTable(
      alias = attr(n, "alias").getOrElse(fail("InlineTable needs an alias")),
      columns = columns,
      rows = rows)
  }

  private def parseLevel(n: Node): Level = Level(
    name = attr(n, "name").getOrElse(fail("Level needs a name")),
    keyColumn = attr(n, "key_column").getOrElse(fail("Level needs a key_column")),
    nameColumn = attr(n, "name_column"),
    properties = (n \ "Property").map { p =>
      PropertyDef(
        name = attr(p, "name").getOrElse(fail("Property needs a name")),
        column = attr(p, "column").getOrElse(fail("Property needs a column")),
        captionSet = attr(p, "caption_set"),
        annotations = annotations(p))
    },
    keyType = attr(n, "key_type").map(MemberType.parse).getOrElse(MemberType.Text),
    annotations = annotations(n),
    derivedFrom = attr(n, "derived_from_column").map(c =>
      DerivedFrom(c, attr(n, "derived_from_unit").getOrElse("year"))))

  /** XML measures spell the aggregator as a string attribute; parameterized
    * aggregators use child attributes, e.g.
    * `<Measure ... aggregator="weighted_sum" weight_column="w"/>`. */
  private def parseMeasure(n: Node): Measure = {
    val agg = attr(n, "aggregator").getOrElse(fail("Measure needs an aggregator")) match {
      case "sum"   => Aggregator.Sum
      case "count" => Aggregator.Count
      case "avg" | "average" => Aggregator.Avg
      case "max"   => Aggregator.Max
      case "min"   => Aggregator.Min
      case "weighted_sum" =>
        Aggregator.WeightedSum(attr(n, "weight_column").getOrElse(fail("weighted_sum needs weight_column")))
      case "weighted_average" =>
        Aggregator.WeightedAvg(attr(n, "weight_column").getOrElse(fail("weighted_average needs weight_column")))
      case "moe" =>
        Aggregator.Moe(attr(n, "critical_value").map(_.toDouble).getOrElse(fail("moe needs critical_value")))
      case "basic_grouped_median" =>
        Aggregator.BasicGroupedMedian(
          attr(n, "group_aggregator").getOrElse(fail("basic_grouped_median needs group_aggregator")),
          attr(n, "group_dimension").getOrElse(fail("basic_grouped_median needs group_dimension")))
      case "approx_distinct" =>
        Aggregator.ApproxDistinct(attr(n, "k").map(_.toInt).getOrElse(64))
      case other => fail(s"unknown aggregator '$other'")
    }
    Measure(
      name = attr(n, "name").getOrElse(fail("Measure needs a name")),
      column = attr(n, "column").getOrElse(fail("Measure needs a column")),
      aggregator = agg,
      annotations = annotations(n))
  }
}
