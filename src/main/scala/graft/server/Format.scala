package graft.server

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Response formatters (reference tesseract-core/src/format.rs:32-257):
  * csv, jsonrecords (`{"data":[{...}],"source":[...]}`), jsonarrays
  * (`{"headers":[...],"data":[[...]]}`).
  *
  * Rows stream through `toLocalIterator` — the driver holds one partition at
  * a time, never the whole result (the reference's streaming mode,
  * format_stream.rs, with Spark's iterator taking the role of the block
  * stream). */
object Format {

  sealed trait FormatType
  object FormatType {
    case object Csv         extends FormatType
    case object JsonRecords extends FormatType
    case object JsonArrays  extends FormatType
    def parse(s: String): Either[String, FormatType] = s match {
      case "csv"         => Right(Csv)
      case "jsonrecords" => Right(JsonRecords)
      case "jsonarrays"  => Right(JsonArrays)
      case other         => Left(s"unknown format '$other' (csv|jsonrecords|jsonarrays)")
    }
  }

  /** Cube source metadata block (reference handlers/util.rs:47-69). */
  final case class SourceMetadata(name: String, measures: Seq[String], annotations: Map[String, String])

  def jsonEscape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def jsonValue(v: Any): String = v match {
    case null                => "null"
    case s: String           => "\"" + jsonEscape(s) + "\""
    case d: Double           => if (d.isNaN || d.isInfinite) "null" else d.toString
    case f: Float            => jsonValue(f.toDouble)
    case b: Boolean          => b.toString
    case d: java.math.BigDecimal => d.toPlainString
    case d: BigDecimal       => d.bigDecimal.toPlainString
    case n: Number           => n.toString
    case other               => "\"" + jsonEscape(String.valueOf(other)) + "\""
  }

  private def csvValue(v: Any): String = v match {
    case null => ""
    case s: String =>
      if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
        "\"" + s.replace("\"", "\"\"") + "\""
      else s
    case d: java.math.BigDecimal => d.toPlainString
    case other => String.valueOf(other)
  }

  def format(df: DataFrame, fmt: FormatType, source: Option[SourceMetadata] = None): String = {
    val sb = new java.lang.StringBuilder(8192)
    write(sb, df, fmt, source)
    sb.toString
  }

  /** Streams the formatted result into `out`. */
  def write(out: java.lang.Appendable, df: DataFrame, fmt: FormatType,
      source: Option[SourceMetadata]): Unit = {
    val headers = df.columns
    val it = df.toLocalIterator().asScala
    fmt match {
      case FormatType.Csv =>
        out.append(headers.map(csvValue).mkString(",")).append("\n")
        it.foreach { row =>
          out.append(headers.indices.map(i => csvValue(row.get(i))).mkString(",")).append("\n")
        }
      case FormatType.JsonRecords =>
        out.append("{\"data\":[")
        var first = true
        it.foreach { row =>
          if (!first) out.append(",")
          first = false
          out.append(headers.indices.map { i =>
            "\"" + jsonEscape(headers(i)) + "\":" + jsonValue(row.get(i))
          }.mkString("{", ",", "}"))
        }
        out.append("]")
        source.foreach { s =>
          out.append(",\"source\":[").append(sourceJson(s)).append("]")
        }
        out.append("}")
      case FormatType.JsonArrays =>
        out.append("{\"headers\":[")
        out.append(headers.map(h => "\"" + jsonEscape(h) + "\"").mkString(","))
        out.append("],\"data\":[")
        var first = true
        it.foreach { row =>
          if (!first) out.append(",")
          first = false
          out.append(headers.indices.map(i => jsonValue(row.get(i))).mkString("[", ",", "]"))
        }
        out.append("]}")
    }
  }

  def sourceJson(s: SourceMetadata): String = {
    val anns = s.annotations.map { case (k, v) =>
      "\"" + jsonEscape(k) + "\":\"" + jsonEscape(v) + "\""
    }.mkString("{", ",", "}")
    "{\"name\":\"" + jsonEscape(s.name) + "\",\"measures\":[" +
      s.measures.map(m => "\"" + jsonEscape(m) + "\"").mkString(",") +
      "],\"annotations\":" + anns + "}"
  }
}
