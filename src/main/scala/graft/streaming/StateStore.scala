package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Durable checkpoint store for the incremental-dedup carried state — the
  * "production deployment persists both to DFS parquet between refreshes"
  * contract that [[DedupStream.PairState]] and [[SemDedupStream.SemState]]
  * promise. Without it a restart loses the gram/edge history and the next
  * refresh silently degrades to a from-scratch rebuild (or, worse, a
  * partial state that yields a wrong verdict).
  *
  * Commit protocol — the classic versioned-directory + atomic-pointer
  * scheme every table-format checkpoint uses (and the reason a parquet
  * `overwrite` alone is NOT a checkpoint: it deletes the old state before
  * the new one is fully written, so a crash mid-save loses both):
  *
  *   1. write all state tables under a fresh `v{N+1}/` directory;
  *   2. flip the `_CURRENT` pointer file to `N+1` via write-temp +
  *      ATOMIC_MOVE — readers see either the old version or the new one,
  *      never a torn state;
  *   3. prune versions older than the previous one (the previous survives
  *      one extra cycle for in-flight readers).
  *
  * A crash between (1) and (2) leaves an orphaned `v{N+1}` that the next
  * save overwrites; `load` keeps serving `vN`. StreamStateSpec kills the
  * in-memory state between refreshes, reloads from disk, and proves the
  * final verdict identical to the never-restarted run — and that a
  * simulated crash-before-flip leaves the previous state readable. */
object StateStore {

  private def currentVersion(dir: String): Option[Long] = {
    val p = Paths.get(dir, "_CURRENT")
    if (Files.exists(p)) Some(Files.readString(p).trim.toLong) else None
  }

  /** Persist `tables` as the next state version; returns the version. */
  def save(dir: String, tables: Map[String, DataFrame]): Long = {
    Files.createDirectories(Paths.get(dir))
    val prev = currentVersion(dir)
    val next = prev.getOrElse(0L) + 1
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$dir/v$next/$name.parquet")
    }
    val tmp = Paths.get(dir, "_CURRENT.tmp")
    Files.writeString(tmp, next.toString)
    Files.move(tmp, Paths.get(dir, "_CURRENT"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    // prune everything older than the previous version
    prev.foreach { p =>
      val d = Paths.get(dir)
      if (Files.isDirectory(d)) {
        val it = Files.list(d).iterator()
        while (it.hasNext) {
          val f = it.next()
          val n = f.getFileName.toString
          if (n.startsWith("v") && n.drop(1).forall(_.isDigit) && n.drop(1).toLong < p)
            deleteRecursively(f)
        }
      }
    }
    next
  }

  /** Read the committed state tables, None if no version was ever flipped. */
  def load(spark: SparkSession, dir: String, names: Seq[String]): Option[Map[String, DataFrame]] =
    currentVersion(dir).map { v =>
      names.map(n => n -> spark.read.parquet(s"$dir/v$v/$n.parquet")).toMap
    }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p)) {
      val it = Files.list(p).iterator()
      while (it.hasNext) deleteRecursively(it.next())
    }
    Files.deleteIfExists(p)
  }

  // ------------------------------------------------- typed wrappers

  def savePairState(dir: String, s: DedupStream.PairState): Long =
    save(dir, Map("grams" -> s.grams, "pairs" -> s.pairs))

  def loadPairState(spark: SparkSession, dir: String): Option[DedupStream.PairState] =
    load(spark, dir, Seq("grams", "pairs")).map(m =>
      DedupStream.PairState(m("grams"), m("pairs")))

  def saveSemState(dir: String, s: SemDedupStream.SemState): Long =
    save(dir, Map("members" -> s.members, "edges" -> s.edges))

  def loadSemState(spark: SparkSession, dir: String): Option[SemDedupStream.SemState] =
    load(spark, dir, Seq("members", "edges")).map(m =>
      SemDedupStream.SemState(m("members"), m("edges")))

  def saveTrainedState(dir: String, s: SemDedupStream.TrainedState): Long =
    save(dir, Map("members" -> s.members, "edges" -> s.edges))

  def loadTrainedState(spark: SparkSession, dir: String): Option[SemDedupStream.TrainedState] =
    load(spark, dir, Seq("members", "edges")).map(m =>
      SemDedupStream.TrainedState(m("members"), m("edges")))
}
