package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Transliteration of the reference's name-grammar tests
  * (tesseract-core/src/names.rs:456-597) — every accepted spelling of
  * level/drilldown/cut/property, masks, brackets, `&` member markers. */
class NamesSpec extends AnyFunSuite {

  private val level = LevelName("Geography", "Geography", "County")

  test("level name from 3-part and 2-part vectors") {
    assert(LevelName.fromParts(Seq("Geography", "Geography", "County")) == Right(level))
    assert(LevelName.fromParts(Seq("Geography", "County")) == Right(level))
  }

  test("level name rejects 4-part and 1-part vectors") {
    assert(LevelName.fromParts(Seq("Geography", "Geography", "County", "County")).isLeft)
    assert(LevelName.fromParts(Seq("County")).isLeft)
  }

  test("level name parse: dotted, bracketed, 2-part") {
    assert(LevelName.parse("Geography.Geography.County") == Right(level))
    assert(LevelName.parse("[Geography].[Geography].[County]") == Right(level))
    assert(LevelName.parse("Geography.County") == Right(level))
  }

  test("drilldown parse mirrors level name parse") {
    val d = Drilldown(level)
    assert(Drilldown.parse("Geography.Geography.County") == Right(d))
    assert(Drilldown.parse("[Geography].[Geography].[County]") == Right(d))
    assert(Drilldown.parse("Geography.County") == Right(d))
  }

  test("cut parse: single member") {
    val cut1 = CutSpec(level, Seq("1"))
    assert(CutSpec.parse("Geography.Geography.County.1") == Right(cut1))
    assert(CutSpec.parse("[Geography].[Geography].[County].&[1]") == Right(cut1))
    assert(CutSpec.parse("Geography.County.1") == Right(cut1))
  }

  test("cut parse: member list with & markers") {
    val cut2 = CutSpec(level, Seq("1", "2"))
    assert(CutSpec.parse("Geography.Geography.County.1,2") == Right(cut2))
    assert(CutSpec.parse("[Geography].[Geography].[County].&[1,2]") == Right(cut2))
    assert(CutSpec.parse("Geography.County.1,2") == Right(cut2))
    assert(CutSpec.parse("Geography.County.&1,2") == Right(cut2))
    assert(CutSpec.parse("Geography.County.&1,&2") == Right(cut2))
  }

  test("cut parse: ~ exclude mask") {
    val cut2not = CutSpec(level, Seq("1", "2"), Mask.Exclude)
    assert(CutSpec.parse("~Geography.Geography.County.1,2") == Right(cut2not))
  }

  test("cut parse: * LIKE-match mode") {
    val cutLike = CutSpec(level, Seq("abc"), Mask.Include, forMatch = true)
    assert(CutSpec.parse("*Geography.Geography.County.abc") == Right(cutLike))
    val cutBoth = CutSpec(level, Seq("abc"), Mask.Exclude, forMatch = true)
    assert(CutSpec.parse("~*Geography.Geography.County.abc") == Right(cutBoth))
  }

  test("cut parse rejects empty and malformed") {
    assert(CutSpec.parse("").isLeft)
    assert(CutSpec.parse("~").isLeft)
    assert(CutSpec.parse("County").isLeft)
  }

  test("property parse: dotted, bracketed, 2-part") {
    val p = PropertyName(level, "name_en")
    assert(PropertyName.parse("Geography.Geography.County.name_en") == Right(p))
    assert(PropertyName.parse("[Geography].[Geography].[County].[name_en]") == Right(p))
    assert(PropertyName.parse("Geography.County.name_en") == Right(p))
  }

  test("property parse rejects 2 or fewer parts") {
    assert(PropertyName.parse("County.name_en").isLeft)
    assert(PropertyName.parse("name_en").isLeft)
  }

  test("measure name strips brackets") {
    assert(MeasureName.parse("[Quantity]") == Right(MeasureName("Quantity")))
    assert(MeasureName.parse("Quantity") == Right(MeasureName("Quantity")))
  }
}
