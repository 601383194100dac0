package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.SparkTestSession.SfDir

class MgSketchSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def summarize(items: Seq[String], m: Int): MgSketch.Summary = {
    val s = mutable.HashMap.empty[String, Long]
    items.foreach(MgSketch.insert(s, _, m))
    s
  }

  test("insert keeps the summary bounded and never overestimates") {
    val r = new scala.util.Random(11)
    val stream = Seq.fill(2000)(s"t${r.nextInt(50)}") ++ Seq.fill(300)("hot")
    val shuffled = r.shuffle(stream)
    val m = 16
    val s = summarize(shuffled, m)
    assert(s.size <= m)
    val exact = shuffled.groupBy(identity).view.mapValues(_.size.toLong).toMap
    s.foreach { case (k, est) =>
      assert(est <= exact(k), s"MG must never overestimate ($k: $est > ${exact(k)})")
      assert(est >= exact(k) - shuffled.size / (m + 1), "error bound N/(m+1)")
    }
  }

  test("guarantee survives arbitrary split + merge trees (mergeable summaries)") {
    val r = new scala.util.Random(23)
    (0 until 20).foreach { trial =>
      // zipf-ish stream: heavy keys plus a long tail
      val n = 500 + r.nextInt(3000)
      val stream = Seq.fill(n) {
        val x = r.nextInt(100)
        if (x < 40) s"h${x % 4}" else s"tail${r.nextInt(400)}"
      }
      val m = 24
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap

      // random partitioning, summarize each part, merge in random order
      val parts = stream.grouped(1 + r.nextInt(stream.size)).toIndexedSeq
      var acc = mutable.HashMap.empty[String, Long]
      r.shuffle(parts).foreach { p => acc = MgSketch.merge(acc, summarize(p, m), m) }

      assert(acc.size <= m, s"trial $trial: merged summary over capacity")
      exact.foreach { case (k, c) =>
        if (c > n.toLong / (m + 1))
          assert(acc.contains(k), s"trial $trial: guaranteed key $k (count $c of $n) missing")
      }
    }
  }

  test("p39 equals the exact full groupBy and is partitioning-invariant") {
    val exact = {
      val toks = spark.read.parquet(s"$SfDir/documents.parquet")
        .select(explode(split(col("text"), " ")).as("tok"))
      val n = toks.count()
      toks.groupBy("tok").agg(count(lit(1)).as("freq"))
        .where(col("freq") * graft.pipeline.PipelineOps.HeavyHitterDen >= n)
        .select(col("tok"), col("freq")).as[(String, Long)].collect().toMap
    }
    assert(exact.nonEmpty, "fixture must have heavy hitters for the test to bite")
    val got = graft.pipeline.PipelineOps.heavyHitters(spark, SfDir)
      .select(col("tok"), col("freq")).as[(String, Long)].collect().toMap
    assert(got == exact)

    // the sketch's extra candidates vary with partitioning; the confirmed
    // answer must not
    Seq(1, 7).foreach { np =>
      val docs = spark.read.parquet(s"$SfDir/documents.parquet").repartition(np)
      val toks = docs.select(explode(split(col("text"), " ")).as("tok"))
      val sk = toks.agg(
        MgSketch.candidatesCol(col("tok"), graft.pipeline.PipelineOps.MgCapacity).as("cands"),
        count(lit(1)).as("n_total"))
      val cands = sk.select(col("n_total"), explode(col("cands")).as("tok"))
      val res = toks.join(broadcast(cands), "tok")
        .groupBy("tok", "n_total").agg(count(lit(1)).as("freq"))
        .where(col("freq") * graft.pipeline.PipelineOps.HeavyHitterDen >= col("n_total"))
        .select(col("tok"), col("freq")).as[(String, Long)].collect().toMap
      assert(res == exact, s"answer drifted at $np partitions")
    }
  }

  test("serialize/deserialize round-trips, including multi-byte UTF-8 keys") {
    val s = mutable.HashMap("a" -> 3L, "日本語" -> 7L, "" -> 1L, "x" * 100 -> 2L)
    val agg = MgSketch.Candidates(org.apache.spark.sql.catalyst.expressions.Literal("x"), 8)
    assert(agg.deserialize(agg.serialize(s)) == s)
  }
}
