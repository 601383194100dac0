package graft.core

import org.json4s._
import org.json4s.jackson.JsonMethods

/** JSON schema reader, wire-compatible with the reference's config format
  * (tesseract-core/src/schema/json.rs:9-134): `cubes[].{name, table,
  * dimensions[], dimension_usages[], measures[]}`, `shared_dimensions[]`,
  * hierarchies with `inline_table`/`default_member`, aggregator as a string
  * (`"sum"`) or an object for the parameterized forms.
  *
  * Validation mirrors tesseract-core/src/lib.rs:94-151: ≥1 dimension per
  * cube, unique dimension names, multi-hierarchy dims must name a
  * default_hierarchy (single-hierarchy defaults are cleared).
  */
object SchemaJson {

  final case class SchemaError(message: String) extends RuntimeException(message)
  private def fail(m: String): Nothing = throw SchemaError(m)

  def parse(json: String): Schema = {
    val root = JsonMethods.parse(json)
    val shared = arr(root \ "shared_dimensions").map(parseDimension(_, None))
    val cubes = arr(root \ "cubes") match {
      case Nil => fail("schema must declare at least one cube")
      case cs  => cs.map(parseCube(_, shared))
    }
    validate(Schema(
      name = str(root \ "name").getOrElse(fail("schema needs a name")),
      cubes = cubes,
      annotations = annotations(root),
      defaultLocale = str(root \ "default_locale")))
  }

  // ------------------------------------------------------------ validation

  def validate(schema: Schema): Schema = {
    schema.cubes.foreach { cube =>
      if (cube.dimensions.isEmpty)
        fail(s"cube '${cube.name}' must have at least one dimension")
      val names = cube.dimensions.map(_.name)
      if (names.distinct.length != names.length)
        fail(s"cube '${cube.name}' has duplicate dimension names")
      cube.dimensions.foreach { d =>
        if (d.hierarchies.isEmpty) fail(s"dimension '${d.name}' has no hierarchies")
        if (d.hierarchies.length > 1 && d.defaultHierarchy.isEmpty)
          fail(s"dimension '${d.name}' has multiple hierarchies but no default_hierarchy")
        d.defaultHierarchy.foreach { dh =>
          if (!d.hierarchies.exists(_.name == dh))
            fail(s"default_hierarchy '$dh' of dimension '${d.name}' does not exist")
        }
        d.hierarchies.foreach { h =>
          if (h.levels.isEmpty) fail(s"hierarchy '${h.name}' has no levels")
        }
      }
    }
    // single-hierarchy dims: default_hierarchy is cleared (lib.rs:120-130)
    schema.copy(cubes = schema.cubes.map(c => c.copy(dimensions = c.dimensions.map { d =>
      if (d.hierarchies.length == 1) d.copy(defaultHierarchy = None) else d
    })))
  }

  // --------------------------------------------------------------- parsing

  private def arr(v: JValue): List[JValue] = v match {
    case JArray(xs) => xs
    case JNothing | JNull => Nil
    case other => fail(s"expected array, got $other")
  }
  private def str(v: JValue): Option[String] = v match {
    case JString(s) => Some(s)
    case JInt(i)    => Some(i.toString)
    case _          => None
  }
  private def num(v: JValue): Option[Double] = v match {
    case JDouble(d)  => Some(d)
    case JInt(i)     => Some(i.toDouble)
    case JDecimal(d) => Some(d.toDouble)
    case JString(s)  => s.toDoubleOption
    case _           => None
  }
  private def annotations(v: JValue): Seq[Annotation] =
    arr(v \ "annotations").flatMap { a =>
      for { n <- str(a \ "name"); t <- str(a \ "text") } yield Annotation(n, t)
    }

  private def parseTable(v: JValue): TableDef = TableDef(
    name = str(v \ "name").getOrElse(fail("table needs a name")),
    schema = str(v \ "schema"),
    primaryKey = str(v \ "primary_key"))

  private def parseCube(v: JValue, shared: Seq[Dimension]): Cube = {
    val own = arr(v \ "dimensions").map(parseDimension(_, None))
    // dimension_usages instantiate shared dimensions with a foreign key;
    // name defaults to the source (reference schema.rs:72-126)
    val used = arr(v \ "dimension_usages").map { u =>
      val source = str(u \ "source").getOrElse(fail("dimension_usage needs a source"))
      val base = shared.find(_.name == source)
        .getOrElse(fail(s"shared dimension '$source' not found"))
      base.copy(
        name = str(u \ "name").getOrElse(source),
        foreignKey = Some(str(u \ "foreign_key").getOrElse(fail("dimension_usage needs a foreign_key"))),
        isShared = true)
    }
    Cube(
      name = str(v \ "name").getOrElse(fail("cube needs a name")),
      table = parseTable(v \ "table"),
      dimensions = own ++ used,
      measures = arr(v \ "measures").map(parseMeasure),
      public = str(v \ "public").forall(_.toBoolean),
      minAuthLevel = num(v \ "min_auth_level").map(_.toInt).getOrElse(0),
      annotations = annotations(v))
  }

  private def parseDimension(v: JValue, fk: Option[String]): Dimension = Dimension(
    name = str(v \ "name").getOrElse(fail("dimension needs a name")),
    foreignKey = str(v \ "foreign_key").orElse(fk),
    hierarchies = arr(v \ "hierarchies").map(parseHierarchy),
    defaultHierarchy = str(v \ "default_hierarchy"),
    dimType = str(v \ "type").map(DimensionType.parse).getOrElse(DimensionType.Standard),
    annotations = annotations(v))

  private def parseHierarchy(v: JValue): Hierarchy = {
    val levels = arr(v \ "levels").map(parseLevel)
    Hierarchy(
      name = str(v \ "name").getOrElse(fail("hierarchy needs a name")),
      table = (v \ "table") match { case JNothing | JNull => None; case t => Some(parseTable(t)) },
      inlineTable = (v \ "inline_table") match {
        case JNothing | JNull => None
        case it => Some(parseInlineTable(it))
      },
      // primary_key defaults to the lowest level's key column (schema.rs:407-418)
      primaryKey = str(v \ "primary_key")
        .orElse(levels.lastOption.map(_.keyColumn))
        .getOrElse(fail("hierarchy needs a primary_key or levels")),
      levels = levels,
      defaultMember = str(v \ "default_member"),
      annotations = annotations(v))
  }

  private def parseInlineTable(v: JValue): InlineTable = InlineTable(
    alias = str(v \ "alias").getOrElse(fail("inline_table needs an alias")),
    columns = arr(v \ "column_definitions").map { c =>
      InlineColumn(
        name = str(c \ "name").getOrElse(fail("inline column needs a name")),
        columnType = str(c \ "key_type").map(MemberType.parse).getOrElse(MemberType.Text),
        castType = str(c \ "key_column_type"),
        captionSet = str(c \ "caption_set"))
    },
    rows = arr(v \ "rows").map { r =>
      arr(r \ "row_values").flatMap(str) match {
        case Nil => arr(r).flatMap(str) // tolerate a plain array row form
        case vs  => vs
      }
    })

  private def parseLevel(v: JValue): Level = Level(
    name = str(v \ "name").getOrElse(fail("level needs a name")),
    keyColumn = str(v \ "key_column").getOrElse(fail("level needs a key_column")),
    nameColumn = str(v \ "name_column"),
    properties = arr(v \ "properties").map { p =>
      PropertyDef(
        name = str(p \ "name").getOrElse(fail("property needs a name")),
        column = str(p \ "column").getOrElse(fail("property needs a column")),
        captionSet = str(p \ "caption_set"),
        annotations = annotations(p))
    },
    keyType = str(v \ "key_type").map(MemberType.parse).getOrElse(MemberType.Text),
    annotations = annotations(v),
    // engine extension (not in the reference wire format): declares the key
    // as derived from a date column so cuts push a scan-prunable range
    derivedFrom = str(v \ "derived_from_column").map(c =>
      DerivedFrom(c, str(v \ "derived_from_unit").getOrElse("year"))))

  /** Aggregator: a plain string (`"sum"`) or an object form for the
    * parameterized aggregators (reference schema/aggregator.rs:11-93 serde). */
  private def parseAggregator(v: JValue): Aggregator = v match {
    case JString(s) => s.toLowerCase match {
      case "sum"   => Aggregator.Sum
      case "count" => Aggregator.Count
      case "avg" | "average" => Aggregator.Avg
      case "max"   => Aggregator.Max
      case "min"   => Aggregator.Min
      case other   => fail(s"unknown aggregator '$other'")
    }
    case obj: JObject =>
      val fields = obj.obj.toMap
      def f(k: String): JValue = fields.getOrElse(k, JNothing)
      fields.keySet.intersect(Set(
        "basic_grouped_median", "weighted_sum", "weighted_average",
        "moe", "replicate_weight_moe", "weighted_average_moe", "custom",
        "approx_distinct")).headOption match {
        case Some("basic_grouped_median") =>
          val in = f("basic_grouped_median")
          Aggregator.BasicGroupedMedian(
            str(in \ "group_aggregator").getOrElse(fail("basic_grouped_median needs group_aggregator")),
            str(in \ "group_dimension").getOrElse(fail("basic_grouped_median needs group_dimension")))
        case Some("weighted_sum") =>
          Aggregator.WeightedSum(str(f("weighted_sum") \ "weight_column")
            .getOrElse(fail("weighted_sum needs weight_column")))
        case Some("weighted_average") =>
          Aggregator.WeightedAvg(str(f("weighted_average") \ "weight_column")
            .getOrElse(fail("weighted_average needs weight_column")))
        case Some("moe") =>
          Aggregator.Moe(num(f("moe") \ "critical_value").getOrElse(fail("moe needs critical_value")))
        case Some("replicate_weight_moe") =>
          val in = f("replicate_weight_moe")
          Aggregator.ReplicateWeightMoe(
            num(in \ "critical_value").getOrElse(fail("needs critical_value")),
            num(in \ "design_factor").getOrElse(fail("needs design_factor")),
            arr(in \ "secondary_columns").flatMap(str))
        case Some("weighted_average_moe") =>
          val in = f("weighted_average_moe")
          Aggregator.WeightedAverageMoe(
            num(in \ "critical_value").getOrElse(fail("needs critical_value")),
            num(in \ "design_factor").getOrElse(fail("needs design_factor")),
            str(in \ "primary_weight").getOrElse(fail("needs primary_weight")),
            arr(in \ "secondary_weight_columns").flatMap(str))
        case Some("custom") => Aggregator.Custom(str(f("custom")).getOrElse(
          str(f("custom") \ "template").getOrElse(fail("custom needs a template"))))
        case Some("approx_distinct") =>
          Aggregator.ApproxDistinct(
            num(f("approx_distinct") \ "k").map(_.toInt).getOrElse(64))
        case _ => fail(s"unknown aggregator object: $obj")
      }
    case other => fail(s"unknown aggregator: $other")
  }

  private def parseMeasure(v: JValue): Measure = Measure(
    name = str(v \ "name").getOrElse(fail("measure needs a name")),
    column = str(v \ "column").getOrElse(fail("measure needs a column")),
    aggregator = parseAggregator(v \ "aggregator"),
    annotations = annotations(v))
}
