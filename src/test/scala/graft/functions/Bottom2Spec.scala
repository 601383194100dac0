package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Algebraic fuzz of the Bottom2 buffer ops: however the input stream is
  * carved into partitions (update order + merge tree), the result must
  * equal the sorted-take-2 of the whole multiset — the mergeability
  * contract that lets the aggregate run map-side. */
class Bottom2Spec extends AnyFunSuite {

  private val rng = new scala.util.Random(0xB072)

  private def viaBuffers(parts: Seq[Seq[(Double, Long)]]): Seq[Long] = {
    val partials = parts.map { p =>
      p.foldLeft(Array.emptyLongArray) { case (b, (o, i)) => Bottom2.insert(b, o, i) }
    }
    // merge in a right fold (deliberately not the same order as a reduce)
    val merged = partials.foldLeft(Array.emptyLongArray) { (acc, p) =>
      var b = acc
      var k = 0
      while (k < p.length) {
        b = Bottom2.insert(b, java.lang.Double.longBitsToDouble(p(k)), p(k + 1)); k += 2
      }
      b
    }
    (0 until merged.length / 2).map(k => merged(2 * k + 1))
  }

  test("insert+merge equals sorted take-2 under random partitionings") {
    for (trial <- 0 until 200) {
      val n = 1 + rng.nextInt(12)
      // a few duplicate ord values to exercise the id tie-break
      val items = (0 until n).map { i =>
        (math.floor(rng.nextDouble() * 4) / 4.0, rng.nextInt(100).toLong)
      }.distinct
      val nParts = 1 + rng.nextInt(4)
      val parts = items.groupBy(_ => rng.nextInt(nParts)).values.toSeq
      val expected = items.sorted.take(2).map(_._2)
      assert(viaBuffers(parts) == expected, s"trial $trial items=$items")
    }
  }

  test("empty and singleton groups") {
    assert(viaBuffers(Seq(Seq.empty)) == Seq.empty)
    assert(viaBuffers(Seq(Seq((0.5, 7L)))) == Seq(7L))
  }

  test("spark-side: bottom2 over a grouped frame matches a window top-2") {
    import graft.SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val df = (0 until 500).map { i =>
      (i % 17.toLong, rng.nextDouble(), rng.nextInt(1000).toLong)
    }.toDF("g", "ord", "id")
      .localCheckpoint(false) // pin the random data so both plans see it
    val got = df.groupBy("g").agg(Bottom2(col("ord"), col("id")).as("ids"))
      .select(col("g"), col("ids")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val w = Window.partitionBy("g").orderBy(col("ord").asc, col("id").asc)
    val want = df.withColumn("rn", row_number().over(w)).where(col("rn") <= 2)
      .orderBy("g", "rn").collect()
      .groupBy(_.getLong(0)).map { case (g, rows) => g -> rows.map(_.getLong(2)).toList }
    assert(got == want)
  }
}
