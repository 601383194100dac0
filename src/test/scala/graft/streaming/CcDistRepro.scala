package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.PipelineOps

/** One-off repro driver for the distributed-forest fuzz failure. */
object CcDistRepro {
  def main(args: Array[String]): Unit = {
    sys.props("graft.cc.forestEdgeBound") = "0"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def ccOracle(pairs: org.apache.spark.sql.DataFrame) =
      PipelineOps.connectedComponents(pairs.select(col("doc_a"), col("doc_b")))
    def check(labels: org.apache.spark.sql.DataFrame, pairs: org.apache.spark.sql.DataFrame, ctx: String): Unit = {
      val lm = labels.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      val om = ccOracle(pairs).collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      assert(lm == om, s"canonicality $ctx")
      val forest = pairs.where(col("in_forest")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val members = lm.groupBy(_._2).view.mapValues(_.size).toMap
      val fPerComp = forest.groupBy(e => lm(e._1)).view.mapValues(_.size).toMap
      for ((l, n) <- members) {
        val f = fPerComp.getOrElse(l, 0)
        assert(f == (if (n == 1) 0 else n - 1), s"$ctx comp $l: $f forest for $n members")
      }
      assert(forest.forall(e => lm(e._1) == lm(e._2)), s"$ctx forest crosses comps")
    }

    for (seed <- Seq(7L, 23L)) {
      val rnd = new scala.util.Random(seed)
      var nextId = 1000L
      var edges = Seq.newBuilder[(Long, Long)]
      var base = 0L
      for (c <- 0 until 4) {
        val n = 4 + rnd.nextInt(4)
        for (i <- 0 until n; j <- i + 1 until n) edges += ((base + i, base + j))
        base += 100
      }
      for (i <- 0 until 12) edges += ((base + i, base + i + 1))
      base += 100
      for (i <- 1 to 6) edges += ((base, base + i))
      val init = edges.result().toDF("doc_a", "doc_b")
      try {
        val (labels0, pairs0) = IncrementalCc.initial(init)
        var labels = labels0.localCheckpoint(true)
        var pairs = pairs0.localCheckpoint(true)
        check(labels, pairs, s"seed $seed init")
        println(s"SEED $seed INIT ok")
        for (step <- 0 until 8) {
          val nodes = labels.select("node").as[Long].collect()
          val retiredIds = rnd.nextInt(4) match {
            case 0 => Seq.empty[Long]
            case 1 => rnd.shuffle(nodes.toSeq).take(1 + rnd.nextInt(3))
            case 2 =>
              val ls = labels.select("label").distinct().as[Long].collect()
              if (ls.isEmpty) Seq.empty[Long] else Seq(ls(rnd.nextInt(ls.length)))
            case _ =>
              val ls = labels.select("label").distinct().as[Long].collect()
              if (ls.isEmpty) Seq.empty[Long]
              else {
                val l = ls(rnd.nextInt(ls.length))
                val mem = labels.where(col("label") === l).select("node").as[Long].collect()
                rnd.shuffle(mem.toSeq).take(math.max(1, mem.length - 1))
              }
          }
          val survivors = nodes.filterNot(retiredIds.contains)
          val newEdges = Seq.newBuilder[(Long, Long)]
          val nNew = rnd.nextInt(4)
          for (_ <- 0 until nNew if survivors.length >= 2) {
            val a = survivors(rnd.nextInt(survivors.length))
            val b = survivors(rnd.nextInt(survivors.length))
            if (a != b) newEdges += ((math.min(a, b), math.max(a, b)))
          }
          if (rnd.nextBoolean() && survivors.nonEmpty) {
            val f = nextId; nextId += 1
            newEdges += ((math.min(f, survivors(rnd.nextInt(survivors.length))),
              math.max(f, survivors(rnd.nextInt(survivors.length)))))
          }
          if (retiredIds.nonEmpty && survivors.nonEmpty && rnd.nextInt(3) == 0) {
            val re = retiredIds(rnd.nextInt(retiredIds.length))
            val s = survivors(rnd.nextInt(survivors.length))
            newEdges += ((math.min(re, s), math.max(re, s)))
          }
          val retired = retiredIds.toDF("doc_id").localCheckpoint(true)
          val np = newEdges.result().distinct.toDF("doc_a", "doc_b").localCheckpoint(true)
          val d = IncrementalCc.refresh(labels, pairs, retired, np)
          val r = retired.select(col("doc_id"))
          val out = d.labelsOut.select(col("node"))
          labels = labels.join(out, Seq("node"), "left_anti").unionByName(d.labelsIn)
            .localCheckpoint(true)
          pairs = pairs
            .join(r.select(col("doc_id").as("doc_a")), Seq("doc_a"), "left_anti")
            .join(r.select(col("doc_id").as("doc_b")), Seq("doc_b"), "left_anti")
            .join(d.pairsOut.select(col("node").as("elabel")), Seq("elabel"), "left_anti")
            .unionByName(d.pairsIn)
            .localCheckpoint(true)
          check(labels, pairs, s"seed $seed step $step")
          println(s"SEED $seed STEP $step ok")
        }
      } catch {
        case t: Throwable =>
          println("THREW: " + t)
          t.printStackTrace()
          spark.stop(); sys.exit(1)
      }
    }
    println("ALL OK")
    spark.stop()
  }
}
