package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness (not a spec): the round-12 extra-decade ramp for
  * the round-11 operator family (p52/p55/p58) plus p55's per-refresh
  * cost as batch count grows — the SCALING.md rows. Run with:
  *   sbt "Test/runMain graft.pipeline.RampProbe /tmp/ramp"
  * (fixture pair from tools/gen_ramp_fixture.py: sfA 5k docs/2k vecs,
  * sfB 10x both). Methodology matches the round-11 ramp: full warmup
  * pass on sfA, then min-of-2 per (op, scale), one JVM, local[32]. */
object RampProbe {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/tmp/ramp")
    val spark = SparkSession.builder()
      .master("local[32]").appName("ramp-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val ops: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
      "p52_semdedup_trained" -> (PipelineOps.semDedupTrained _),
      "p55_trained_incremental" -> (PipelineOps.semDedupTrainedIncremental _),
      "p58_ann_index_refresh" -> (PipelineOps.annIndexRefresh _),
      "p61_dedup_delta" -> (PipelineOps.dedupVerdictDelta _),
      "p62_semdedup_delta" -> (PipelineOps.semDedupDelta _),
      "p63_ann_index_delta" -> (PipelineOps.annIndexDelta _),
      "p64_span_scrub" -> (PipelineOps.spanScrub _),
      "p65_training_order" -> (PipelineOps.trainingOrder _),
      "p66_calibrated_filter" -> (PipelineOps.calibratedFilter _),
      "p67_embedding_drift" -> (PipelineOps.embeddingDrift _),
      "p68_dataset_card" -> (PipelineOps.datasetCard _),
      "p70_dataset_card_delta" -> (PipelineOps.datasetCardDelta _))
    def run(f: (SparkSession, String) => org.apache.spark.sql.DataFrame, d: String): Double =
      time(f(spark, d).write.format("noop").mode("overwrite").save())
    ops.foreach { case (_, f) => run(f, s"$root/sfA") } // warmup
    for ((nm, f) <- ops; tag <- Seq("A", "B")) {
      val d = s"$root/sf$tag"
      val t = math.min(run(f, d), run(f, d))
      println(f"RAMP $nm $tag $t%.3f")
    }

    // p55 per-refresh cost as the batch count grows: same corpus (sfB),
    // same frozen quantizer, carved into k batches — per-refresh cost
    // must track BATCH size (halve as k doubles), never history size
    val dirB = s"$root/sfB"
    val q = PipelineOps.quantized(spark, dirB)
      .select(col("vec_id"), col("q"), col("nrm")).localCheckpoint(false)
    val n = spark.read.parquet(s"$dirB/embeddings.parquet").count()
    val maxId = q.agg(max(col("vec_id"))).collect()(0).getLong(0)
    val trained = PipelineOps.trainCentroids(q, PipelineOps.semCells(n))
      .localCheckpoint(false)
    trained.count()
    for (k <- Seq(2, 4, 8)) {
      var state: Option[graft.streaming.SemDedupStream.TrainedState] = None
      val times = (0 until k).map { i =>
        val lo = maxId * i / k; val hi = if (i == k - 1) maxId else maxId * (i + 1) / k
        val batch = q.where(col("vec_id") > lo && col("vec_id") <= hi ||
          (lit(i) === 0 && col("vec_id") === 0))
        time {
          val st = graft.streaming.SemDedupStream.refreshTrained(
            trained, batch, state, PipelineOps.SemMaxCell, PipelineOps.SemDupThreshold)
          st.members.count(); st.edges.count() // materialize the lazy checkpoints
          state = Some(st)
        }
      }
      println(f"P55BATCHES k=$k total=${times.sum}%.3f per=[${times.map(t => f"$t%.2f").mkString(",")}]")
    }
    spark.stop()
  }
}
