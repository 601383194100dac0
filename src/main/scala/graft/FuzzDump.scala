package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Fuzz-corpus dump in the Verify contract: each QueryFuzzer case's planner
  * result → parquet, the case's (dialect-portable) SQL → oracle_sql.json —
  * so `tools/compare.py <sfDir> <outDir>` cross-checks the identical corpus
  * against DuckDB that FuzzSpec checks against `spark.sql`. */
object FuzzDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val planner = graft.engine.TpchStar.planner(sfDir)
    val cases = graft.fuzz.QueryFuzzer.cases(160) ++
      graft.fuzz.QueryFuzzer.rcaCases(50) ++
      graft.fuzz.QueryFuzzer.rateCases(40)
    cases.foreach { fc =>
      planner.plan(spark, fc.query).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/${fc.name}")
    }
    // logic-layer corpus through the real wire-param path
    val ll = new graft.plan.LogicLayer(planner)
    val llCases = graft.fuzz.QueryFuzzer.llCases(60)
    llCases.foreach { fc =>
      val q = graft.server.QueryParams.toLogicLayerQuery(fc.params, graft.engine.TpchStar.salesCube)
      ll.plan(spark, q).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/${fc.name}")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = (cases.map(fc => s"${q(fc.name)}: ${q(fc.sql)}") ++
      llCases.map(fc => s"${q(fc.name)}: ${q(fc.sql)}")).mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
