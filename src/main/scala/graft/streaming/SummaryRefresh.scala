package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Incremental maintenance of a pre-aggregated summary (the streaming twin
  * of [[graft.plan.Preagg]]): as fact files land, each micro-batch computes
  * its partial aggregates at the summary grain and merges them into the
  * store by key — sums add, counts add, min/min, max/max. The summary stays
  * fresh without ever rescanning history; per-batch work is
  * O(batch + summary), not O(fact).
  *
  * The store here is swap-replaced parquet (single-writer local layout; a
  * cluster deployment would land the same delta-merge on a transactional
  * table format). The merge shape — keyed combine of re-aggregable
  * partials — is the part that scales; it is exactly
  * [[graft.plan.Preagg.reAggregator]]'s algebra applied continuously.
  */
object SummaryRefresh {

  final case class MeasureSpec(out: String, expr: String, combine: String) {
    require(Set("sum", "min", "max").contains(combine), s"non-reaggregable combine '$combine'")
  }

  /** Partial aggregates of one fact chunk at the grain. */
  def partials(chunk: DataFrame, keys: Seq[String], meas: Seq[MeasureSpec]): DataFrame = {
    val aggs = meas.map(m => expr(s"${m.combine}(${m.expr})").as(m.out))
    chunk.groupBy(keys.map(k => col(s"`$k`")): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Keyed combine of an existing summary with a delta of the same shape. */
  def merge(existing: DataFrame, delta: DataFrame, keys: Seq[String], meas: Seq[MeasureSpec]): DataFrame = {
    val aggs = meas.map(m => expr(s"${m.combine}(`${m.out}`)").as(m.out))
    existing.unionByName(delta)
      .groupBy(keys.map(k => col(s"`$k`")): _*).agg(aggs.head, aggs.tail: _*)
  }

  private def deleteRec(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))

  /** Starts the refresh stream: watches `factDir` for new files and folds
    * each micro-batch into the parquet store at `storePath`. `transform`
    * runs on each batch before aggregation — summary grains are routinely
    * DERIVED columns (a month from a timestamp, a histogram bin from a
    * value: [[graft.pipeline.PipelineOps.histQuantilesFromCounts]] serves
    * quantiles from a store maintained exactly this way), and the derive
    * must happen stream-side so the store's keys are the grain, not the
    * fact. */
  def run(
      spark: SparkSession,
      factDir: String,
      factSchema: StructType,
      storePath: String,
      checkpoint: String,
      keys: Seq[String],
      meas: Seq[MeasureSpec],
      maxFilesPerTrigger: Int = 1,
      transform: DataFrame => DataFrame = identity): StreamingQuery =
    runFold(spark, factDir, factSchema, storePath, checkpoint,
      partialsOf = batch => partials(transform(batch), keys, meas),
      combine = (existing, delta) => merge(existing, delta, keys, meas),
      maxFilesPerTrigger = maxFilesPerTrigger)

  /** The generalized fold: each micro-batch maps to its partial-aggregate
    * frame via `partialsOf`, then folds into the store via `combine` (a
    * keyed re-agg combine of two store-shaped frames). [[run]] is the
    * MeasureSpec instantiation; [[graft.plan.Preagg]] instantiates it with
    * the full cube algebra (`summaryFrame` per chunk +
    * `mergeSummaries`) so a streamed store can serve the SAME
    * [[graft.plan.PreaggPlanner]] routing as a batch-materialized summary
    * — including KMV sketch columns, whose union is lossless. */
  def runFold(
      spark: SparkSession,
      factDir: String,
      factSchema: StructType,
      storePath: String,
      checkpoint: String,
      partialsOf: DataFrame => DataFrame,
      combine: (DataFrame, DataFrame) => DataFrame,
      maxFilesPerTrigger: Int = 1): StreamingQuery =
    spark.readStream
      .schema(factSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(factDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val delta = partialsOf(batch)
        val merged =
          if (Files.exists(Paths.get(storePath, "_SUCCESS")))
            combine(batch.sparkSession.read.parquet(storePath), delta)
          else delta
        // swap-replace: stage next to the store, then move into place (the
        // local stand-in for a transactional commit)
        val staging = s"$storePath.staging"
        merged.write.mode("overwrite").parquet(staging)
        deleteRec(Paths.get(storePath))
        Files.move(Paths.get(staging), Paths.get(storePath))
        ()
      }
      .start()
}
