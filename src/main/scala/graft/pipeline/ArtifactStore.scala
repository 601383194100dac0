package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession

/** Hadoop-`FileSystem`-routed storage for persisted derived artifacts —
  * the p60 dedup-verdict table and the p49/p58/p63 ANN index trees.
  *
  * Production shape: these artifacts are corpus-scale parquet relations
  * written by EXECUTOR tasks, so their roots must live on a filesystem
  * every executor can reach. A driver-local `java.io.tmpdir` works only
  * at local[n]; on a real cluster the root must be DFS. All paths here
  * resolve through the Hadoop `FileSystem` of the path itself — the same
  * resolution Spark's parquet writers use — so markers, version
  * directories, prunes, and the data files always land on the SAME
  * filesystem (the failure mode this object exists to prevent: driver
  * `java.io.File` markers on local disk coordinating parquet files on
  * HDFS). Same routing [[graft.streaming.StateStore]] uses for the
  * incremental-dedup checkpoints.
  *
  * Root resolution: `graft.index.dir` system property (test seam), else
  * the `GRAFT_INDEX_DIR` env var (the production knob — point it at an
  * HDFS/S3A/... scratch namespace), else local `java.io.tmpdir`.
  *
  * Artifact roots are keyed by (dataset dir, corpus fingerprint, Spark
  * app id): the FINGERPRINT — FS metadata (name, length, mtime) of the
  * source parquet, a listing not a scan — means a dataset directory
  * rewritten mid-application hashes to a NEW root and rebuilds, instead
  * of serving a verdict/index computed over bytes that no longer exist.
  * The app id keeps two concurrent apps from racing overwrite-vs-read
  * on one tree. */
object ArtifactStore {

  /** Test seam mirror of GRAFT_INDEX_DIR (env vars can't be set from a
    * running JVM). None = env var, else tmpdir. */
  @volatile private[graft] var indexDirOverride: Option[String] = None

  private[graft] def artifactRoot: String =
    indexDirOverride
      .orElse(sys.env.get("GRAFT_INDEX_DIR"))
      .getOrElse(sys.props("java.io.tmpdir"))

  private[graft] def fsOf(spark: SparkSession, path: String): FileSystem =
    new HPath(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Content-version fingerprint of a source parquet path from FS
    * metadata only (recursive file statuses: name, length, mtime).
    * Cheap (a NameNode listing at HDFS scale), and any rewrite of the
    * source — overwrite, append, compaction — changes it. */
  private[graft] def fingerprint(spark: SparkSession, path: String): Long = {
    val fs = fsOf(spark, path)
    val p = new HPath(path)
    if (!fs.exists(p)) return 0L
    val it = fs.listFiles(p, true)
    var h = 1125899906842597L // large prime seed
    while (it.hasNext) {
      val st = it.next()
      val s = s"${st.getPath.getName}#${st.getLen}#${st.getModificationTime}"
      h += Hashing.md5Long(s, 12) // order-independent: listing order is FS-dependent
    }
    h
  }

  /** Root directory for one artifact family over one dataset dir. */
  private[graft] def artifactPath(
      spark: SparkSession, tag: String, dir: String, sourceFile: String): String = {
    val fp = fingerprint(spark, s"$dir/$sourceFile")
    val key = Hashing.md5Long(
      s"$dir#$fp#${spark.sparkContext.applicationId}", 12)
    s"${artifactRoot.stripSuffix("/")}/graft-$tag-${"%012x".format(key)}"
  }

  /** True if `path` exists on its own filesystem. */
  private[graft] def exists(spark: SparkSession, path: String): Boolean =
    fsOf(spark, path).exists(new HPath(path))

  /** Create an empty marker file; returns false if it already existed
    * (CREATE-EXCLUSIVE — the cross-process half of a double-checked
    * build lock). */
  private[graft] def createMarker(spark: SparkSession, path: String): Boolean = {
    val fs = fsOf(spark, path)
    val p = new HPath(path)
    fs.mkdirs(p.getParent)
    try { fs.create(p, false).close(); true }
    catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case _: java.nio.file.FileAlreadyExistsException => false
      case _: java.io.IOException if fs.exists(p) => false
    }
  }

  /** Recursive delete (no-op if absent). */
  private[graft] def delete(spark: SparkSession, path: String): Unit = {
    val fs = fsOf(spark, path)
    val p = new HPath(path)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Version numbers already allocated under `root` (`v{N}` children). */
  private[graft] def versions(spark: SparkSession, root: String): Seq[Long] = {
    val fs = fsOf(spark, root)
    val p = new HPath(root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.length > 1 && n.drop(1).forall(_.isDigit))
      .map(_.drop(1).toLong)
  }

  /** Claim a fresh exclusive `v{N}` directory under `root` via
    * CREATE-EXCLUSIVE on its `_ALLOC` marker (crash leftovers and
    * concurrent claimants advance past each other — StateStore's
    * allocation protocol). Returns (version, path). */
  private[graft] def claimVersion(spark: SparkSession, root: String): (Long, String) = {
    var n = versions(spark, root).foldLeft(0L)(math.max) + 1
    while (!createMarker(spark, s"$root/v$n/_ALLOC")) n += 1
    (n, s"$root/v$n")
  }

  /** Max version under `root` carrying a `_COMMITTED` marker — the
    * object-store-safe resolution (see [[graft.streaming.StateStore]]'s
    * protocol: a version is visible iff its marker exists, and
    * CREATE-EXCLUSIVE is atomic where rename is not). */
  private[graft] def committedVersion(spark: SparkSession, root: String): Option[Long] =
    versions(spark, root).filter(v => exists(spark, s"$root/v$v/_COMMITTED")) match {
      case Seq() => None
      case vs    => Some(vs.max)
    }

  /** Commit `df` as the single table `name` of a fresh version under
    * `root`: claim → write → CREATE-EXCLUSIVE `_COMMITTED` → prune
    * versions older than the previous committed one (in-flight readers
    * of the previous version survive one commit cycle). A crash before
    * the marker leaves an invisible orphan a later prune removes —
    * readers keep serving the previous version, never a torn table. */
  private[graft] def commitTable(
      spark: SparkSession, root: String, name: String,
      df: org.apache.spark.sql.DataFrame): Long = {
    val (n, vdir) = claimVersion(spark, root)
    df.write.mode("overwrite").parquet(s"$vdir/$name.parquet")
    createMarker(spark, s"$vdir/_COMMITTED")
    val keepFrom = versions(spark, root)
      .filter(v => v < n && exists(spark, s"$root/v$v/_COMMITTED")) match {
      case Seq() => n
      case older => older.max
    }
    versions(spark, root).filter(_ < keepFrom)
      .foreach(v => delete(spark, s"$root/v$v"))
    n
  }

  /** The committed table's parquet path under `root`, None before the
    * first commit. */
  private[graft] def committedTablePath(
      spark: SparkSession, root: String, name: String): Option[String] =
    committedVersion(spark, root).map(v => s"$root/v$v/$name.parquet")
}
