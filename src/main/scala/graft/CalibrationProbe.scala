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
  * profile (fresh JVM, 10 back-to-back runs): the first execution pays
  * ~3 s of Janino+JIT, runs 2-4 still sit 15-25% above the eventual floor
  * while C2 finishes, and the floor arrives around run 5-7 — so one
  * warmup + min-of-3 systematically inflated the PRE-pass probe relative
  * to the fully-warm POST-pass one (the round-11/12 captures tripped
  * their own drift flag on exactly that bias). [[measure]] therefore
  * warms up FOUR untimed runs before its min-of-3: `probe_sec =
  * min(pre, post)` was always post-dominated, so the change sharpens the
  * pre/post drift FLAG without moving the normalization anchor.
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

  /** Four untimed warmups (see the warmup profile above), then min-of-3. */
  def measure(spark: SparkSession): Double = {
    (1 to 4).foreach(_ => once(spark))
    Seq.fill(3)(once(spark)).min
  }
}
