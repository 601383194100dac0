package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fixed CPU-bound calibration workload shared by the benchmarks — the
  * in-run anchor that makes cross-round numbers comparable on a host whose
  * throughput drifts between captures (round 10 measured a uniform 1.43×
  * drift across 89 unchanged plans; see SCALING.md "Cross-round
  * comparability").
  *
  * The workload: 2^33 rows of xxhash64 folded by a bit_xor aggregate
  * (overflow-free under ANSI, unlike sum), 32 input partitions, whole-stage
  * codegen end to end, no input I/O and no data shuffle. Identical work
  * every run regardless of SF dir, so its wall time IS the host's current
  * CPU throughput: ~0.6-1.2 s steady-state on this box. Measured warmup
  * profile: the first execution pays ~3 s of Janino+JIT, runs 2-3 land at
  * steady state with occasional +0.3 s scheduler spikes — hence one untimed
  * warmup then min-of-3 per [[measure]] call.
  *
  * Reported metrics divide by the probe: `x_norm = x_sec / probe_sec` is a
  * dimensionless cost in units of "one calibration workload". A real plan
  * regression moves a query's ratio; host churn moves the probe and the raw
  * numbers together and cancels. */
object CalibrationProbe {
  def once(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    spark.range(0L, 1L << 33, 1L, 32)
      .select(xxhash64(col("id")).as("h"))
      .agg(expr("bit_xor(h)").as("x"), count(lit(1)).as("n"))
      .write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  /** One untimed warmup, then min-of-3. */
  def measure(spark: SparkSession): Double = {
    once(spark)
    Seq.fill(3)(once(spark)).min
  }
}
