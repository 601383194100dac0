package graft.core

/** Query model + option-string grammars.
  * Reference: tesseract-core/src/query.rs (FromStr impls, tests :562-603). */

sealed trait Comparison { def apply(l: Double, r: Double): Boolean }
object Comparison {
  case object Eq  extends Comparison { def apply(l: Double, r: Double) = l == r }
  case object Neq extends Comparison { def apply(l: Double, r: Double) = l != r }
  case object Lt  extends Comparison { def apply(l: Double, r: Double) = l < r }
  case object Lte extends Comparison { def apply(l: Double, r: Double) = l <= r }
  case object Gt  extends Comparison { def apply(l: Double, r: Double) = l > r }
  case object Gte extends Comparison { def apply(l: Double, r: Double) = l >= r }
  def parse(s: String): Either[String, Comparison] = s match {
    case "eq" => Right(Eq);  case "neq" => Right(Neq)
    case "lt" => Right(Lt);  case "lte" => Right(Lte)
    case "gt" => Right(Gt);  case "gte" => Right(Gte)
    case _    => Left(s"could not parse comparison '$s'")
  }
}

final case class Constraint(comparison: Comparison, n: Double)
object Constraint {
  /** `gt.42`, `gt..2` (leading-dot float), `gt.-5` / `lt.-0.5` (negative
    * thresholds — growth is routinely negative) — query.rs:205-223. */
  def parse(s: String): Either[String, Constraint] = s.split("\\.", 2) match {
    case Array(cmp, n) if n.nonEmpty =>
      for {
        c <- Comparison.parse(cmp)
        v <- try Right(n.toDouble) catch { case _: NumberFormatException => Left(s"bad number '$n'") }
      } yield Constraint(c, v)
    case _ => Left(s"could not parse constraint '$s'")
  }
}

sealed trait SortDirection
object SortDirection {
  case object Asc  extends SortDirection
  case object Desc extends SortDirection
  def parse(s: String): Either[String, SortDirection] = s match {
    case "asc" => Right(Asc); case "desc" => Right(Desc)
    case _     => Left(s"could not parse sort direction '$s'")
  }
}

/** `rca`/`growth` are reserved calculation names usable wherever a measure is. */
sealed trait MeaOrCalc
object MeaOrCalc {
  final case class Mea(name: MeasureName) extends MeaOrCalc
  case object RcaCalc    extends MeaOrCalc
  case object GrowthCalc extends MeaOrCalc
  def parse(s: String): Either[String, MeaOrCalc] = s.toLowerCase match {
    case "rca"    => Right(RcaCalc)
    case "growth" => Right(GrowthCalc)
    case _        => MeasureName.parse(s).map(Mea(_))
  }
}

/** `top=n,ByLevel,mea,desc` — keep top n rows per by-level group. */
final case class TopQuery(n: Long, byDimension: LevelName, sortMeaOrCalc: Seq[MeaOrCalc], sortDirection: SortDirection)
object TopQuery {
  def parse(s: String): Either[String, TopQuery] = s.split(',') match {
    case Array(n, by, mea, dir) =>
      for {
        nn <- try Right(n.toLong) catch { case _: NumberFormatException => Left(s"bad top n '$n'") }
        ln <- LevelName.parse(by)
        m  <- MeaOrCalc.parse(mea)
        d  <- SortDirection.parse(dir)
      } yield TopQuery(nn, ln, Seq(m), d)
    case _ => Left(s"could not parse top query '$s'")
  }
}

/** `top_where=mea,gt.42` — filter before Top is applied. */
final case class TopWhereQuery(byMeaOrCalc: MeaOrCalc, constraint: Constraint)
object TopWhereQuery {
  def parse(s: String): Either[String, TopWhereQuery] = s.split(",", 2) match {
    case Array(m, c) => for { mm <- MeaOrCalc.parse(m); cc <- Constraint.parse(c) } yield TopWhereQuery(mm, cc)
    case _           => Left(s"could not parse top_where '$s'")
  }
}

sealed trait FilterOp
object FilterOp {
  case object And extends FilterOp
  case object Or  extends FilterOp
}

/** HAVING-style filter on an aggregated measure; optional `.and./.or.`
  * second constraint (query.rs:457-521). */
final case class FilterQuery(
    byMeaOrCalc: MeaOrCalc, constraint: Constraint,
    operator: Option[FilterOp] = None, constraint2: Option[Constraint] = None)
object FilterQuery {
  def parse(s: String): Either[String, FilterQuery] =
    if (s.contains(".and.") || s.contains(".or.")) {
      val parts = s.split('.')
      val opIdx = parts.indexWhere(p => p == "and" || p == "or")
      if (opIdx < 0) Left(s"could not parse filter '$s'")
      else
        for {
          m  <- MeaOrCalc.parse(parts(0))
          c1 <- Constraint.parse(parts.slice(1, opIdx).mkString("."))
          op  = if (parts(opIdx) == "and") FilterOp.And else FilterOp.Or
          c2 <- Constraint.parse(parts.drop(opIdx + 1).mkString("."))
        } yield FilterQuery(m, c1, Some(op), Some(c2))
    } else s.split("\\.", 2) match {
      case Array(m, c) => for { mm <- MeaOrCalc.parse(m); cc <- Constraint.parse(c) } yield FilterQuery(mm, cc)
      case _           => Left(s"could not parse filter '$s'")
    }
}

/** `limit=n` or `limit=offset,n`. */
final case class LimitQuery(offset: Option[Long], n: Long)
object LimitQuery {
  def parse(s: String): Either[String, LimitQuery] =
    try s.split(',') match {
      case Array(off, n) => Right(LimitQuery(Some(off.toLong), n.toLong))
      case Array(n)      => Right(LimitQuery(None, n.toLong))
      case _             => Left(s"could not parse limit '$s'")
    } catch { case _: NumberFormatException => Left(s"could not parse limit '$s'") }
}

/** `sort=mea.desc`. */
final case class SortQuery(direction: SortDirection, measure: MeaOrCalc)
object SortQuery {
  def parse(s: String): Either[String, SortQuery] = {
    val idx = s.lastIndexOf('.')
    if (idx < 0) Left(s"could not parse sort '$s'")
    else for {
      m <- MeaOrCalc.parse(s.substring(0, idx))
      d <- SortDirection.parse(s.substring(idx + 1))
    } yield SortQuery(d, m)
  }
}

/** `growth=TimeLevel,mea` — period-over-period change of `mea` along the time level. */
final case class GrowthQuery(timeDrill: Drilldown, mea: MeasureName)
object GrowthQuery {
  def parse(s: String): Either[String, GrowthQuery] = s.split(',') match {
    case Array(t, m) => for { td <- Drilldown.parse(t); mm <- MeasureName.parse(m) } yield GrowthQuery(td, mm)
    case _           => Left(s"could not parse growth '$s'")
  }
}

/** `rca=Drill1,Drill2,mea` — revealed comparative advantage (a/b)/(c/d). */
final case class RcaQuery(drill1: Drilldown, drill2: Drilldown, mea: MeasureName)
object RcaQuery {
  def parse(s: String): Either[String, RcaQuery] = s.split(',') match {
    case Array(d1, d2, m) =>
      for { a <- Drilldown.parse(d1); b <- Drilldown.parse(d2); mm <- MeasureName.parse(m) } yield RcaQuery(a, b, mm)
    case _ => Left(s"could not parse rca '$s'")
  }
}

/** `rate=Level.v1,v2` — share of the (single, sum/count) measure attributable
  * to the listed members of the level. */
final case class RateQuery(levelName: LevelName, values: Seq[String])
object RateQuery {
  def parse(s: String): Either[String, RateQuery] = {
    val parts = s.split('.')
    if (parts.length <= 2 || parts.length >= 5) Left(s"malformatted rate query '$s'")
    else for {
      ln <- LevelName.parse(parts.dropRight(1).mkString("."))
    } yield RateQuery(ln, parts.last.split(',').toSeq)
  }
}

/** One cube query — the reference's whole user-facing algebra
  * (tesseract-core/src/query.rs:14-33). */
final case class CubeQuery(
    drilldowns: Seq[Drilldown] = Nil,
    cuts: Seq[CutSpec] = Nil,
    measures: Seq[MeasureName] = Nil,
    properties: Seq[PropertyName] = Nil,
    filters: Seq[FilterQuery] = Nil,
    captions: Seq[PropertyName] = Nil,
    parents: Boolean = false,
    top: Option[TopQuery] = None,
    topWhere: Option[TopWhereQuery] = None,
    sort: Option[SortQuery] = None,
    limit: Option[LimitQuery] = None,
    rca: Option[RcaQuery] = None,
    growth: Option[GrowthQuery] = None,
    rate: Option[RateQuery] = None,
    debug: Boolean = false,
    sparse: Boolean = false,
    excludeDefaultMembers: Boolean = false)
