package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Hashing
import graft.SparkTestSession.spark

class MinHashSigSpec extends AnyFunSuite {
  import Hashing.{minhashA, minhashB, P, NumHashes}

  private def composable = expr("array(" +
    (0 until NumHashes).map { j =>
      s"array_min(transform(hs, h -> (${minhashA(j)}L * h + ${minhashB(j)}L) % ${P}L))"
    }.mkString(", ") + ")")

  test("native signature equals the composable 32-pass spelling") {
    import spark.implicits._
    val df = Seq(
      Seq(17L, 123456L, 999999937L, 0L),
      Seq(42L),
      (1L to 500L).map(_ * 7919).toSeq
    ).toDF("hs")
    val rows = df
      .withColumn("native", MinHashSig(col("hs"), minhashA, minhashB, P))
      .withColumn("composed", composable)
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2))
    }
  }

  test("interpreted eval matches codegen") {
    import spark.implicits._
    val df = Seq(Seq(5L, 6L, 7L)).toDF("hs")
      .withColumn("sig", MinHashSig(col("hs"), minhashA, minhashB, P))
    val viaCodegen = df.collect().head.getSeq[Long](1)
    val e = MinHashSig(
      org.apache.spark.sql.graft.ColumnBridge.expression(col("hs")), minhashA, minhashB, P)
    val interpreted = e.nullSafeEval(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(5L, 6L, 7L)))
      .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
      .toLongArray().toSeq
    assert(viaCodegen == interpreted)
  }

  test("empty hash array yields Long.MaxValue minima (no elements)") {
    import spark.implicits._
    val df = Seq(Seq.empty[Long]).toDF("hs")
      .withColumn("sig", MinHashSig(col("hs"), minhashA, minhashB, P))
    assert(df.collect().head.getSeq[Long](1).forall(_ == Long.MaxValue))
  }
}
