package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.{spark, SfDir}

/** Oracle-free invariants of the p15 IVF router across the probe axis.
  *
  * IVF is approximate, so unlike the LSH dedup fuzzers there is no exact
  * all-pairs oracle per geometry — but two exact invariants pin the
  * router's correctness anyway:
  *
  *   1. **Exhaustive probing is brute force.** With probes = cells, every
  *      inverted list is scanned, so the result must equal [[PipelineOps
  *      .annBrute]]'s top-3 row-for-row (same tiebreaks, same exclusions).
  *      A routing bug that drops or double-counts a cell breaks this at
  *      some cell count.
  *   2. **Per-rank cosine is monotone in probes.** Growing the probe set
  *      only adds candidates, so for every (query, rank) the cosine at
  *      probes=p' ≥ the cosine at probes=p < p', and every rank present at
  *      p stays present at p'. A probe-selection bug (wrong top-p cells,
  *      off-by-one on the rank window) shows up as a decrease. */
class IvfFuzzSpec extends AnyFunSuite {

  private def ivf(centroids: Int, probes: Int): Map[(Long, Long), (Long, Double)] =
    PipelineOps.annIvfParam(spark, SfDir, centroids, probes)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap

  for (cells <- Seq(5, 16))
    test(s"probing all $cells cells reproduces brute force exactly") {
      val brute = PipelineOps.annBrute(spark, SfDir)
        .where(org.apache.spark.sql.functions.col("rank") <= 3)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
        .toMap
      val exhaustive = ivf(cells, cells)
      assert(exhaustive == brute,
        s"ivf-only=${(exhaustive.toSet -- brute.toSet).take(3)} brute-only=${(brute.toSet -- exhaustive.toSet).take(3)}")
    }

  test("per-rank cosine is monotone non-decreasing in the probe count") {
    val levels = Seq(1, 2, 4, 8, 16).map(p => p -> ivf(16, p))
    for (Seq((pLo, lo), (pHi, hi)) <- levels.sliding(2)) {
      for (((q, rank), (_, cosLo)) <- lo) {
        val at = hi.get((q, rank))
        assert(at.isDefined, s"(query=$q, rank=$rank) present at probes=$pLo but missing at $pHi")
        assert(at.get._2 >= cosLo,
          s"(query=$q, rank=$rank) cosine fell $cosLo -> ${at.get._2} going probes=$pLo -> $pHi")
      }
    }
    // non-degeneracy: the probe sweep must actually change results
    assert(levels.head._2 != levels.last._2, "probes=1 equals probes=16: sweep tests nothing")
  }

  test("persisted-index query knob: per-rank ADC distance is monotone non-increasing " +
       "in nprobe, and every rank present at fewer probes stays present") {
    // the p49 query half's serving knob (round 14): the probed cell set at
    // p is a PREFIX of the set at p' > p (same deterministic ordering), so
    // the candidate pool only grows — per (query, rank) the ADC distance
    // can only improve. A probe-window bug shows up as an increase.
    import org.apache.spark.sql.functions.col
    val idx = java.nio.file.Files.createTempDirectory("graft_nprobe_spec").toString
    PipelineOps.buildAnnIndexOf(
      PipelineOps.quantized(spark, SfDir)
        .select(col("vec_id"), col("q"), col("nrm")).localCheckpoint(false), idx)
    def at(p: Int): Map[(Long, Long), Long] =
      PipelineOps.queryAnnIndex(spark, SfDir, idx, probes = p)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Number]("adist").longValue)
        .toMap
    val levels = Seq(1, 2, 4, 8, 16).map(p => p -> at(p))
    for (Seq((pLo, lo), (pHi, hi)) <- levels.sliding(2)) {
      for (((q, rank), dLo) <- lo) {
        val dHi = hi.get((q, rank))
        assert(dHi.isDefined, s"(query=$q, rank=$rank) present at probes=$pLo but missing at $pHi")
        assert(dHi.get <= dLo,
          s"(query=$q, rank=$rank) ADC distance rose $dLo -> ${dHi.get} going probes=$pLo -> $pHi")
      }
    }
    assert(levels.head._2 != levels.last._2, "probes=1 equals probes=16: sweep tests nothing")
    // the default knob equals the entry-oracle-pinned value
    assert(at(PipelineOps.IvfProbes) ==
      PipelineOps.queryAnnIndex(spark, SfDir, idx).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Number]("adist").longValue).toMap)
  }
}
