package graft.core

/** Fully-qualified name grammars for the public query API.
  *
  * Accepted spellings (reference: tesseract-core/src/names.rs:31-453):
  *   - `Dimension.Hierarchy.Level`
  *   - `Dimension.Level`                  (hierarchy == dimension shorthand)
  *   - `[Dimension].[Hierarchy].[Level]`  (MDX-ish brackets)
  * Cuts add a leading `~` (exclude mask), a leading `*` (LIKE-match mode),
  * optional `&`/`[` prefixes on members, and comma-separated member lists.
  */
final case class LevelName(dimension: String, hierarchy: String, level: String) {
  override def toString: String = s"[$dimension].[$hierarchy].[$level]"
}

object LevelName {
  /** Parts must already be trimmed of `[]` delimiters. */
  def fromParts(parts: Seq[String]): Either[String, LevelName] = parts match {
    case Seq(d, h, l) => Right(LevelName(d, h, l))
    case Seq(d, l)    => Right(LevelName(d, d, l))
    case other        => Left(s"name ${other.mkString(".")} does not follow naming convention")
  }

  private[core] def splitName(s: String): Seq[String] =
    if (s.nonEmpty && s.charAt(0) == '[') {
      // bracketed form: only split on periods between brackets
      s.stripPrefix("[").stripSuffix("]").split("""\]\.\[""", -1).toSeq
    } else s.split('.').toSeq

  def parse(s: String): Either[String, LevelName] =
    if (s.isEmpty) Left("empty level name") else fromParts(splitName(s))
}

final case class Drilldown(levelName: LevelName) {
  override def toString: String = levelName.toString
}
object Drilldown {
  def parse(s: String): Either[String, Drilldown] = LevelName.parse(s).map(Drilldown(_))
}

final case class MeasureName(name: String) {
  override def toString: String = name
}
object MeasureName {
  def parse(s: String): Either[String, MeasureName] =
    Right(MeasureName(s.stripPrefix("[").stripSuffix("]")))
}

sealed trait Mask
object Mask {
  case object Include extends Mask
  case object Exclude extends Mask
}

/** A member filter on one level.
  * `mask=Exclude` (`~` prefix) excludes the members and keeps all others;
  * `forMatch=true` (`*` prefix) treats members as LIKE `%member%` patterns.
  */
final case class CutSpec(
    levelName: LevelName,
    members: Seq[String],
    mask: Mask = Mask.Include,
    forMatch: Boolean = false)

object CutSpec {
  /** Reference: names.rs:296-357. `~` then `*` prefixes, then
    * `Dim.Hier.Level.m1,m2` with optional brackets / `&` member markers. */
  def parse(raw: String): Either[String, CutSpec] = {
    if (raw.isEmpty) return Left("empty cut")
    var s = raw
    val mask = if (s.startsWith("~")) { s = s.substring(1); Mask.Exclude } else Mask.Include
    val forMatch = if (s.startsWith("*")) { s = s.substring(1); true } else false
    if (s.isEmpty) return Left("empty cut")

    val parts: Seq[String] =
      if (s.charAt(0) == '[') {
        s.stripPrefix("[").stripSuffix("]").split("""\]\.""", -1).toSeq
          .map(_.stripPrefix("["))
      } else s.split('.').toSeq

    if (parts.length < 2) return Left(s"cut '$raw' does not follow naming convention")
    val members = parts.last
      .dropWhile(_ == '&').stripPrefix("[")
      .split(',').toSeq.map(_.dropWhile(_ == '&'))
    if (members.isEmpty) Left("no members found")
    else LevelName.fromParts(parts.dropRight(1)).map(ln => CutSpec(ln, members, mask, forMatch))
  }
}

final case class PropertyName(levelName: LevelName, property: String) {
  override def toString: String = s"$levelName.[$property]"
}
object PropertyName {
  def parse(s: String): Either[String, PropertyName] = {
    val parts = LevelName.splitName(s)
    if (parts.length < 3) Left(s"property '$s' does not follow naming convention")
    else LevelName.fromParts(parts.dropRight(1)).map(ln => PropertyName(ln, parts.last))
  }
}
