package graft.pipeline

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestSession.spark

/** Commit-protocol semantics of the versioned/segmented ANN index store:
  * a version (segment + tombstones + manifest) becomes visible in ONE
  * `_COMMITTED` marker create, an uncommitted version is invisible (the
  * crash window of the pre-store append-then-overwrite layout), racing
  * claimants land on distinct versions with max-committed-wins, and
  * prune retires exactly the unreferenced history while keeping the
  * previous version whole for in-flight readers. The end-to-end bump
  * behavior over this store (replay no-ops, compaction, from-scratch
  * oracle equality) lives in IngestBumpSpec. */
class AnnIndexStoreSpec extends AnyFunSuite {

  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-annstore-$tag").toString

  private def seg(ids: Long*): (DataFrame, DataFrame) = (
    ids.toDF("nbr_id").withColumn("ccid", col("nbr_id") % 4),
    ids.toDF("nbr_id").withColumn("m", lit(0L)).withColumn("cid", col("nbr_id") % 8))

  private def writeSeg(idx: String, ids: Long*)(v: Long, segDir: String): Unit = {
    val (a, c) = seg(ids: _*)
    a.write.mode("overwrite").parquet(s"$segDir/ivf_assign.parquet")
    c.write.mode("overwrite").parquet(s"$segDir/pq_codes.parquet")
  }

  private def emptyTomb = Seq.empty[Long].toDF("vec_id")

  test("a claimed-but-uncommitted version is invisible: readers keep serving the " +
       "previous committed version's manifest and mask") {
    val idx = tmp("crash")
    val v1 = AnnIndexStore.commit(spark, idx, emptyTomb,
      segsOf = v => Seq(AnnIndexStore.segNameOf(v)),
      writeSeg = Some(writeSeg(idx, 1L, 2L, 3L)))
    // crash simulation: a second bump claims its version and even writes
    // its segment + tables, but dies before the _COMMITTED create
    val (v2, vdir) = ArtifactStore.claimVersion(spark, idx)
    writeSeg(idx, 99L)(v2, s"$idx/seg-$v2")
    Seq(1L).toDF("vec_id").write.mode("overwrite").parquet(s"$vdir/tombstones.parquet")
    assert(AnnIndexStore.current(spark, idx).map(_._1).contains(v1),
      "uncommitted claim must not resolve as current")
    val (_, segs) = AnnIndexStore.current(spark, idx).get
    assert(AnnIndexStore.segAssigned(spark, idx, segs)
      .select("nbr_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    assert(AnnIndexStore.tombstoneCount(spark, idx) == 0,
      "the dead claimant's tombstones must stay invisible")
  }

  test("racing commits land on distinct versions; max committed wins and is a " +
       "complete internally-consistent version") {
    val idx = tmp("race")
    val vs = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val threads = Seq("a" -> Seq(1L, 2L), "b" -> Seq(10L, 20L)).map { case (tag, ids) =>
      new Thread(() => vs.put(tag, AnnIndexStore.commit(spark, idx, emptyTomb,
        segsOf = v => Seq(AnnIndexStore.segNameOf(v)),
        writeSeg = Some(writeSeg(idx, ids: _*)))))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(vs.get("a") != vs.get("b"), "racers must claim distinct versions")
    val (cur, segs) = AnnIndexStore.current(spark, idx).get
    assert(cur == math.max(vs.get("a"), vs.get("b")))
    val got = AnnIndexStore.segAssigned(spark, idx, segs)
      .select("nbr_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L) || got == Seq(10L, 20L),
      s"served manifest must be exactly one racer's complete segment, got $got")
  }

  test("prune keeps current + previous committed versions and exactly their " +
       "referenced segments; older versions and orphaned segments retire") {
    val idx = tmp("prune")
    def segDirs() = new java.io.File(idx).list().filter(_.startsWith("seg-")).sorted.toSeq
    def verDirs() = new java.io.File(idx).list().filter(_.startsWith("v")).sorted.toSeq
    val v1 = AnnIndexStore.commit(spark, idx, emptyTomb,
      segsOf = v => Seq(AnnIndexStore.segNameOf(v)),
      writeSeg = Some(writeSeg(idx, 1L)))
    // grow: v2 = [seg-1, seg-2]
    AnnIndexStore.commit(spark, idx, emptyTomb,
      segsOf = v => Seq(AnnIndexStore.segNameOf(v1), AnnIndexStore.segNameOf(v)),
      writeSeg = Some(writeSeg(idx, 2L)))
    // compaction-shaped: v3 references ONLY its merged segment
    val v3 = AnnIndexStore.commit(spark, idx, emptyTomb,
      segsOf = v => Seq(AnnIndexStore.segNameOf(v)),
      writeSeg = Some(writeSeg(idx, 1L, 2L)))
    // v1 is older than the previous committed (v2) — retired; seg-1 is
    // still referenced by kept v2's manifest, so it must survive
    assert(verDirs() == Seq(s"v${v3 - 1}", s"v$v3"), s"got ${verDirs()}")
    assert(segDirs().contains(s"seg-$v1"), "segment referenced by the kept previous " +
      "version must survive its own version's retirement")
    // one more commit: v2 retires, seg-1/seg-2 become unreferenced and prune
    val v4 = AnnIndexStore.commit(spark, idx, emptyTomb,
      segsOf = _ => Seq(AnnIndexStore.segNameOf(v3)))
    assert(verDirs() == Seq(s"v$v3", s"v$v4"), s"got ${verDirs()}")
    assert(segDirs() == Seq(s"seg-$v3"), s"got ${segDirs()}")
    // served state is intact throughout
    val (_, segs) = AnnIndexStore.current(spark, idx).get
    assert(AnnIndexStore.segAssigned(spark, idx, segs)
      .select("nbr_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }
}
