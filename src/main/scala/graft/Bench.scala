package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Per-round benchmark: times every SparkEntry query at the driver's scale
  * factor and emits ONE JSON line (stdout + bench_out.json).
  *
  * Honesty rules: a warmup query amortizes session/parquet/codegen startup
  * outside the timings; results materialize through the `noop` sink so every
  * output column is actually computed (a `.count()` would let column pruning
  * skip the measure expressions); failures rethrow instead of recording fake
  * timings. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    materialize("q01_agg") // warmup (not timed)

    val names = SparkEntry.queries.keys.toSeq.sorted
    val results = names.map { name =>
      val t0 = System.nanoTime()
      materialize(name)
      name -> (System.nanoTime() - t0) / 1e9
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    Files.writeString(Paths.get("bench_out.json"), line + "\n")
    spark.stop()
  }
}
