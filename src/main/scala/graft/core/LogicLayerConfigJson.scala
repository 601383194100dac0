package graft.core

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Logic-layer config file reader, wire-compatible with the reference's
  * `logic_layer/config.rs:10-55` JSON shape:
  *
  * {{{
  * { "aliases": {
  *     "cubes": [
  *       { "name": "Sales",
  *         "alternatives": ["sales", "sales_alias"],
  *         "levels":     [{ "current_name": "Geography.Geography.Nation",
  *                          "unique_name": "Supplier Nation" }],
  *         "properties": [{ "current_name": "Part.Part.Part.Part Type",
  *                          "unique_name": "Type" }] } ],
  *     "shared_dimensions": [ { "name": "...", "levels": [...] } ] },
  *   "named_sets": [
  *     { "level_name": "Geography.Geography.Region",
  *       "sets": [{ "set_name": "americas", "values": ["1"] }] } ] }
  * }}}
  *
  * Differences from the reference are loosenings only: `alternatives` may
  * be omitted (the reference TODO wants that too), and level names accept
  * the same 1/2/3-part spellings the query grammar does.
  */
object LogicLayerConfigJson {

  /** Parsed config, keyed the way GraftServer consumes it. */
  final case class LogicLayerConfig(
      /** alias → canonical cube name (one entry per alternative). */
      cubeAliases: Map[String, String],
      namedSets: Seq[graft.plan.NamedSet],
      /** per-cube level renames; None key = shared-dimension renames that
        * apply to every cube. */
      uniqueLevelNames: Map[Option[String], Map[LevelName, String]],
      uniquePropertyNames: Map[Option[String], Map[PropertyName, String]]) {

    /** Effective level renames for one cube: cube-specific override shared. */
    def levelNamesFor(cube: String): Map[LevelName, String] =
      uniqueLevelNames.getOrElse(None, Map.empty) ++
        uniqueLevelNames.getOrElse(Some(cube), Map.empty)

    def propertyNamesFor(cube: String): Map[PropertyName, String] =
      uniquePropertyNames.getOrElse(None, Map.empty) ++
        uniquePropertyNames.getOrElse(Some(cube), Map.empty)
  }

  def parse(json: String): LogicLayerConfig = {
    val root = JsonMethods.parse(json)

    def str(v: JValue): String = v match {
      case JString(s) => s
      case other => throw new IllegalArgumentException(s"expected string, got $other")
    }
    def arr(v: JValue): Seq[JValue] = v match {
      case JArray(xs) => xs
      case JNothing   => Nil
      case other => throw new IllegalArgumentException(s"expected array, got $other")
    }
    def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

    def levelName(s: String): LevelName =
      LevelName.parse(s).fold(e => fail(s"logic-layer config: $e"), identity)
    def propertyName(s: String): PropertyName =
      PropertyName.parse(s).fold(e => fail(s"logic-layer config: $e"), identity)

    def renames(v: JValue, key: String): Seq[(String, String)] =
      arr(v \ key).map(e => str(e \ "current_name") -> str(e \ "unique_name"))

    val cubes = arr(root \ "aliases" \ "cubes")
    val shared = arr(root \ "aliases" \ "shared_dimensions")

    val cubeAliases: Map[String, String] = cubes.flatMap { c =>
      val name = str(c \ "name")
      arr(c \ "alternatives").map(a => str(a) -> name)
    }.toMap

    val levelRenames: Map[Option[String], Map[LevelName, String]] =
      (cubes.map { c =>
        (Some(str(c \ "name")): Option[String]) ->
          renames(c, "levels").map { case (cur, u) => levelName(cur) -> u }.toMap
      } :+ ((None: Option[String]) ->
        shared.flatMap(renames(_, "levels"))
          .map { case (cur, u) => levelName(cur) -> u }.toMap))
        .filter(_._2.nonEmpty).toMap

    val propRenames: Map[Option[String], Map[PropertyName, String]] =
      (cubes.map { c =>
        (Some(str(c \ "name")): Option[String]) ->
          renames(c, "properties").map { case (cur, u) => propertyName(cur) -> u }.toMap
      } :+ ((None: Option[String]) ->
        shared.flatMap(renames(_, "properties"))
          .map { case (cur, u) => propertyName(cur) -> u }.toMap))
        .filter(_._2.nonEmpty).toMap

    val namedSets: Seq[graft.plan.NamedSet] = arr(root \ "named_sets").flatMap { ns =>
      val ln = levelName(str(ns \ "level_name"))
      arr(ns \ "sets").map { s =>
        graft.plan.NamedSet(str(s \ "set_name"), ln, arr(s \ "values").map(str))
      }
    }

    LogicLayerConfig(cubeAliases, namedSets, levelRenames, propRenames)
  }
}
