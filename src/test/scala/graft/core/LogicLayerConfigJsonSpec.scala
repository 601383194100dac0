package graft.core

import org.scalatest.funsuite.AnyFunSuite
import LogicLayerConfigJson.parse

class LogicLayerConfigJsonSpec extends AnyFunSuite {

  test("full config parses: aliases, renames, shared dims, named sets") {
    val c = parse("""{
      "aliases": {
        "cubes": [
          { "name": "Sales", "alternatives": ["s1", "s2"],
            "levels": [{"current_name": "Geography.Geography.Nation", "unique_name": "SN"}],
            "properties": [{"current_name": "Part.Part.Part.Part Type", "unique_name": "T"}] }
        ],
        "shared_dimensions": [
          { "name": "Geography",
            "levels": [{"current_name": "Geography.Geography.Region", "unique_name": "R"}] }
        ]
      },
      "named_sets": [
        { "level_name": "Geography.Geography.Region",
          "sets": [{"set_name": "americas", "values": ["1", "2"]},
                   {"set_name": "emea", "values": ["3"]}] }
      ]
    }""")
    assert(c.cubeAliases == Map("s1" -> "Sales", "s2" -> "Sales"))
    assert(c.namedSets.map(s => (s.name, s.members)) ==
      Seq(("americas", Seq("1", "2")), ("emea", Seq("3"))))
    assert(c.levelNamesFor("Sales") == Map(
      LevelName("Geography", "Geography", "Region") -> "R",
      LevelName("Geography", "Geography", "Nation") -> "SN"))
    // cube the config doesn't mention still inherits shared-dimension renames
    assert(c.levelNamesFor("Other") == Map(
      LevelName("Geography", "Geography", "Region") -> "R"))
    assert(c.propertyNamesFor("Sales") == Map(
      PropertyName(LevelName("Part", "Part", "Part"), "Part Type") -> "T"))
  }

  test("empty and partial configs are fine; alternatives may be omitted") {
    assert(parse("{}").cubeAliases.isEmpty)
    assert(parse("{}").namedSets.isEmpty)
    val c = parse("""{"aliases": {"cubes": [{"name": "Sales"}]}}""")
    assert(c.cubeAliases.isEmpty && c.levelNamesFor("Sales").isEmpty)
  }

  test("malformed level names surface as errors") {
    intercept[IllegalArgumentException] {
      parse("""{"named_sets": [{"level_name": "", "sets": []}]}""")
    }
    intercept[IllegalArgumentException] {
      parse("""{"aliases": {"cubes": [{"name": "S", "alternatives": [1]}]}}""")
    }
  }
}
