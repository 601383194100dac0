package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.spark

/** Fuzzes p41's distributed bigram scoring against a driver-side
  * reimplementation of the same integer-rational model. Random corpora
  * sweep vocabulary size, doc length (including sub-bigram docs that must
  * vanish), repetition level, and source mixes; the int64 ladder
  * (c12·scale DIV c1, per-doc sums, cross-multiplied low flag) has no
  * float step, so every aggregate must match exactly. */
class LmScoreFuzzSpec extends AnyFunSuite {

  private def driverOracle(docs: Seq[(Long, String, String)])
      : Map[String, (Long, Long, Long, Long)] = {
    val grams = docs.flatMap { case (id, src, text) =>
      val t = text.split(" ")
      if (t.length < 2) Nil
      else t.sliding(2).map(p => (id, src, p(0), p(1))).toSeq
    }
    val c12 = grams.groupBy(g => (g._3, g._4)).view.mapValues(_.size.toLong).toMap
    val c1  = grams.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val perDoc = grams.groupBy(g => (g._1, g._2)).map { case ((_, src), gs) =>
      val score = gs.map(g => c12((g._3, g._4)) * PipelineOps.LmScale / c1(g._3)).sum
      (src, gs.size.toLong, score)
    }
    perDoc.groupBy(_._1).view.mapValues { ds =>
      val low = ds.count(d => d._3 * PipelineOps.LmLowDen < d._2 * PipelineOps.LmScale)
      (ds.size.toLong, ds.map(_._2).sum, ds.map(_._3).sum, low.toLong)
    }.toMap
  }

  test("random corpora match the driver bigram-model oracle exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(1234)
    (1 to 6).foreach { trial =>
      val vocab = (1 to (3 + rnd.nextInt(20))).map(i => s"w$i")
      val docs = (1 to (30 + rnd.nextInt(40))).map { id =>
        val len = rnd.nextInt(12) // includes 0/1-token docs
        val words =
          if (rnd.nextBoolean()) Seq.fill(len)(vocab(rnd.nextInt(vocab.size)))
          else Seq.fill(len)(vocab(rnd.nextInt(1 + vocab.size / 4))) // repetitive tail
        (id.toLong, s"src${rnd.nextInt(3)}", words.mkString(" "))
      }
      val got = PipelineOps.lmScoreOf(docs.toDF("doc_id", "source", "text"))
        .collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      assert(got == driverOracle(docs), s"trial$trial")
    }
  }
}
