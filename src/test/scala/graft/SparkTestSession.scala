package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all Spark-backed specs (Test/fork runs the
  * whole suite in a single JVM). */
object SparkTestSession {
  val SfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Engine-agnostic row image for differential specs: column-name-sorted
    * values, row-sorted. Doubles print via toString (injective on distinct
    * doubles); null and the row-sort join use control-char sentinels that
    * cannot collide with data (written as escapes — raw control bytes in a
    * source literal make git treat the file as binary). */
  def rowImage(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect()
      .map(r => cols.indices.map(i => if (r.isNullAt(i)) "\u0000" else r.get(i).toString))
      .toSeq
      .sortBy(_.mkString("\u0001"))
  }
}
