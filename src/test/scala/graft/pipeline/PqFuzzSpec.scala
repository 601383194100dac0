package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.{spark, SfDir}

/** Differential fuzz of the p34 product-quantization encode/ADC pipeline
  * across codebook geometries (subspace count × codebook size). PQ is
  * approximate as an ANN method but every step is DETERMINISTIC int64
  * arithmetic, so an exact driver-side oracle exists per geometry:
  * independent quantization, subspace slicing, per-slot argmin encode
  * (ties to the lowest centroid id), ADC table, partial-sum, and top-k.
  * Catches slice-offset arithmetic (`m*d+1`), tiebreak, and partial-sum
  * bugs that cancel at the production 4×8 point. */
class PqFuzzSpec extends AnyFunSuite {

  private case class Vec(id: Long, q: Array[Long])

  private lazy val vecs: Vector[Vec] = {
    val rows = spark.read.parquet(s"$SfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
    rows.iterator.map { r =>
      val emb = r.getSeq[Float](1)
      Vec(r.getLong(0), emb.map(x => math.floor(x.toDouble * Hashing.QuantScale).toLong).toArray)
    }.toVector.sortBy(_.id)
  }

  private def oracleTopK(subspaces: Int, centroids: Int): Vector[(Long, Long, Long, Long)] = {
    val d = Hashing.EmbDim / subspaces
    def slice(q: Array[Long], m: Int): Array[Long] = q.slice(m * d, (m + 1) * d)
    def l2sq(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val diff = a(i) - b(i); s += diff * diff; i += 1 }
      s
    }
    val books = vecs.filter(_.id < centroids) // codebook = lowest-id vectors' slices
    // table/code indexing below assumes the codebook ids are 0..k-1
    assert(books.map(_.id) == (0L until centroids).toVector, "non-contiguous codebook ids")
    // encode: per (vector, slot) nearest codebook entry, ties to lowest cid
    val codes: Map[Long, Array[Long]] = vecs.map { v =>
      v.id -> Array.tabulate(subspaces) { m =>
        books.map(c => (l2sq(slice(v.q, m), slice(c.q, m)), c.id)).min._2
      }
    }.toMap
    val out = Vector.newBuilder[(Long, Long, Long, Long)]
    for (q <- vecs.filter(_.id < 10)) {
      // ADC: query's exact distance to each (slot, codebook entry)
      val table = Array.tabulate(subspaces, centroids.toInt) { (m, c) =>
        l2sq(slice(q.q, m), slice(books(c).q, m))
      }
      val scored = vecs.filter(_.id != q.id).map { n =>
        val adist = (0 until subspaces).map(m => table(m)(codes(n.id)(m).toInt)).sum
        (adist, n.id)
      }.sorted.take(PipelineOps.PqTopK)
      for (((adist, nbr), i) <- scored.zipWithIndex)
        out += ((q.id, (i + 1).toLong, nbr, adist))
    }
    out.result()
  }

  // (subspaces, centroids): the production point, then slice widths from
  // the whole vector down to scalar slots, and codebook size sweeps
  private val Grid = Seq(
    (4, 8), // production geometry
    (1, 8), // single subspace: slice = whole vector
    (8, 8), // narrower slices
    (16, 4), // 4-wide slices, tiny codebook
    (64, 2), // scalar slots: heaviest explode, binary codebook
    (2, 16) // wide slices, larger codebook
  )

  for ((m, k) <- Grid)
    test(s"pq encode/ADC at $m×$k matches the driver oracle") {
      val got = PipelineOps.annPqParam(spark, SfDir, m, k)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toVector.sorted
      val want = oracleTopK(m, k).sorted
      assert(got == want,
        s"impl=${got.size} oracle=${want.size} rows; " +
          s"impl-only=${(got.toSet -- want.toSet).take(3)} oracle-only=${(want.toSet -- got.toSet).take(3)}")
    }

  test("subspaces must divide the embedding dim") {
    intercept[IllegalArgumentException] {
      PipelineOps.annPqParam(spark, SfDir, 3, 8)
    }
  }
}
