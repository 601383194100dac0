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
  * timings.
  *
  * Each query runs twice and reports the faster run: with 60+ distinct plans
  * in one JVM, a single shot mostly measures that query's Janino/JIT
  * compilation and whatever GC debt the previous queries left — run-to-run
  * variance of 5-10x on the same plan. The two runs are separate full PASSES
  * over the query list (not back-to-back): a transient JVM condition — a
  * code-cache sweep, a mixed-GC spike — hits both halves of a back-to-back
  * pair and survives the min, but by pass 2 every codegen class already
  * exists and the heap has reached steady state, so the min measures the
  * engine's long-lived-service cost.
  *
  * Host-drift calibration: round 10 showed a uniform 1.43x slowdown across 89
  * unchanged plans — pure host throughput, not a plan change — which made raw
  * cross-round totals incomparable. The fix is the in-run anchor
  * [[CalibrationProbe]]: the JSON line carries both raw seconds and
  * `queries_norm` = raw / probe_sec. Cross-round comparisons should use the
  * normalized numbers: a real plan regression moves a query's ratio; host
  * churn moves the probe and the raw numbers together and cancels. The probe
  * runs once before pass 1 and once after pass 2 (min taken) so a mid-bench
  * throughput shift is visible as probe disagreement rather than silently
  * skewing half the queries. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      // bound driver-metadata growth by wall-clock, not heap pressure
      // (SCALING.md ops note): long single-JVM runs otherwise accumulate
      // weak-ref-cleanable RDD/shuffle state between rare full GCs
      .config("spark.cleaner.periodicGC.interval", "5min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(name: String): Unit =
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        // rethrow with the query named: the harness captures only the tail
        // of a failed run, so the name must ride on the exception itself
        throw new RuntimeException(s"bench query '$name' failed: ${e.getMessage}", e)
      }

    materialize("q01_agg") // warmup (not timed)

    def probe(): Double = CalibrationProbe.measure(spark)

    val names = SparkEntry.queries.keys.toSeq.sorted
    def timed(name: String): Double = {
      val t0 = System.nanoTime()
      materialize(name)
      (System.nanoTime() - t0) / 1e9
    }
    val probePre = probe()
    val pass1 = names.map(name => name -> timed(name)).toMap
    val results = names.map(name => name -> math.min(pass1(name), timed(name)))
    val probePost = probe()
    val probeSec = math.min(probePre, probePost)

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val qsNorm = results.map { case (k, v) => "\"" + k + "\":" + f"${v / probeSec}%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val head =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","probe_sec":$probeSec%.3f,"probe_pre":$probePre%.3f,"probe_post":$probePost%.3f,"total_norm":${total / probeSec}%.3f"""
    // stdout gets the full-name line first (complete record for any
    // capture with room), then a SHORT-KEY line LAST: the harness's tail
    // buffer keeps the END of stdout, and even the compact full-name map
    // front-truncated in rounds 13-14 (~2 KB tail vs a ~3.2 KB line). The
    // final line abbreviates each query to its unique q##/p## prefix
    // (~1.6 KB), so whatever happens to the earlier lines, the tail always
    // closes on one complete parseable JSON record. bench_out.json keeps
    // the full record including the normalized map.
    println(head + "}")
    Files.writeString(Paths.get("bench_out.json"),
      head + s""","queries_norm":$qsNorm}""" + "\n")
    val short = results.map { case (k, v) => k.split('_').head -> v }
    val shortKeys =
      if (short.map(_._1).distinct.length == results.length) short
      else results // prefix collision: keep full names rather than drop data
    val qsShort = shortKeys.map { case (k, v) => "\"" + k + "\":" + f"$v%.2f" }
      .mkString("{", ",", "}")
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","sf":"$sfDir","probe_sec":$probeSec%.3f,"total_norm":${total / probeSec}%.3f,"queries":$qsShort}""")
    spark.stop()
  }
}
