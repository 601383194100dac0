package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reader for the `events` table, insulated from the writer's timestamp
  * flavor.
  *
  * The synthetic feed has shipped `ts` in two physical flavors:
  * TIMESTAMP(NANOS), which Spark can only read as a nanos-since-epoch
  * int64 under `spark.sql.legacy.parquet.nanosAsLong`, and
  * TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark reads as
  * TIMESTAMP_NTZ. Every consumer in this repo computes on ONE grain —
  * exact integer epoch MICROSECONDS, the grain DuckDB's `epoch_us` shares
  * (see [[graft.pipeline.PipelineOracles]]) — so this reader normalizes
  * `ts` to an epoch-µs int64 at the scan and nothing downstream ever sees
  * the file flavor. Session gaps, as-of lags and interval windows then
  * stay exact int64 arithmetic in any engine.
  *
  * The NTZ conversion is `timestampdiff(MICROSECOND, <NTZ epoch>, ts)` —
  * pure wall-clock arithmetic between two NTZ values, independent of the
  * session timezone (casting NTZ to TIMESTAMP first would re-interpret the
  * wall clock in the session zone and make the int64 deployment-dependent).
  */
object EventsSource {

  /** Epoch-µs int64 Column for a `ts` column of the given read type. */
  def tsMicros(dt: DataType): Column = dt match {
    // TIMESTAMP(NANOS) surfaced as int64 nanos under nanosAsLong
    case LongType => expr("ts DIV 1000")
    // TIMESTAMP(MICROS/MILLIS, isAdjustedToUTC=false): wall clock, tz-free
    case TimestampNTZType =>
      expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    // TIMESTAMP(isAdjustedToUTC=true): an instant — unix_micros is tz-free
    case TimestampType => unix_micros(col("ts"))
    case other =>
      throw new IllegalArgumentException(s"events.ts has unsupported type $other")
  }

  /** The file-level `ts` type of `<dir>/events.parquet` (probed from the
    * footer; nanos files require the legacy long read, set here). */
  def tsFileType(spark: SparkSession, dir: String): DataType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
  }

  /** Batch read of `<dir>/events.parquet` with `ts` normalized to
    * epoch-µs int64. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.withColumn("ts", tsMicros(raw.schema("ts").dataType))
  }
}
