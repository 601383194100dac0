package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession.spark

/** Differential fuzz of [[PipelineOps.connectedComponents]] over
  * adversarial graph shapes. The fixture-driven specs exercise the dup
  * graphs the corpus happens to produce; this spec generates the shapes
  * star contraction is weakest on — long paths (maximum round count),
  * hubs, cycles, preferential-attachment skew, seeded random graphs, plus
  * degenerate inputs (self-loops, duplicate and reversed edges,
  * non-contiguous 1e12-scale ids) — and checks BOTH execution paths
  * against an independent union-find oracle written here:
  *
  *   - the distributed star-contraction loop (`localEdgeThreshold = 0`),
  *   - the driver union-find tail (threshold above every edge count).
  *
  * Labels must equal the component MINIMUM exactly on either path — the
  * canonical-id contract every consumer (p23 clusters, p36 verdicts)
  * depends on. */
class CcFuzzSpec extends AnyFunSuite {

  /** Independent union-find — deliberately NOT the impl's LongMap tail. */
  private def oracleLabels(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      parent.getOrElseUpdate(x, x)
      if (parent(x) == x) x
      else { val r = find(parent(x)); parent(x) = r; r }
    }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // canonicalize to the component min (the tree root is already the min
    // under min-wins union, but path-compress to be sure)
    nodes.map(n => n -> find(n)).toMap
  }

  private def run(edges: Seq[(Long, Long)], threshold: Long): Map[Long, Long] = {
    import spark.implicits._
    PipelineOps.connectedComponents(edges.toDF("doc_a", "doc_b"), threshold)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private val rng = new scala.util.Random(0xC0FFEE)

  // name -> edge list; ids deliberately non-contiguous (×1e12 + offset)
  // on some shapes to catch arithmetic/contiguity assumptions
  private val Shapes: Seq[(String, Seq[(Long, Long)])] = Seq(
    "path-300" -> (0L until 299L).map(i => (i, i + 1)),
    "hub-400" -> (1L to 400L).map(i => (0L, i)),
    "two-cycles+selfloops" ->
      ((0L until 51L).map(i => (i, (i + 1) % 51)) ++ // odd cycle
        (100L until 200L).map(i => (i, if (i == 199) 100L else i + 1)) ++ // even cycle
        Seq((999L, 999L), (1000L, 1000L))), // self-loop-only nodes
    "dup+reversed-edges" ->
      Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 2L), (10L, 11L), (11L, 10L)),
    "sparse-random-500" -> Seq.fill(400)((rng.nextInt(500).toLong, rng.nextInt(500).toLong)),
    "pref-attach-300" -> {
      // preferential attachment: node i attaches to a degree-weighted
      // earlier node — produces the power-law hubs dup graphs show
      val targets = scala.collection.mutable.ArrayBuffer(0L)
      (1L until 300L).map { i =>
        val t = targets(rng.nextInt(targets.length))
        targets += i; targets += t
        (i, t)
      }.toSeq
    },
    "big-ids" -> (0L until 100L).map(i => (i * 1_000_000_000_000L + 7, (i / 3) * 1_000_000_000_000L + 7))
  )

  for ((name, edges) <- Shapes) {
    val want = oracleLabels(edges)

    test(s"cc driver union-find tail on $name matches oracle") {
      assert(run(edges, Long.MaxValue) == want)
    }

    test(s"cc distributed star contraction on $name matches oracle") {
      assert(run(edges, 0L) == want)
    }
  }

  /** The forest paths: labels must match the oracle AND the flagged edge
    * subset must be a spanning forest of every component — |F| =
    * |members| − 1 per component, F ⊆ input edges, CC(F) = CC(E). Both
    * the driver tail and the distributed Borůvka path (forced with
    * bound 0) take the same gate, on every adversarial shape. */
  private def checkForest(edges: Seq[(Long, Long)], bound: Long, name: String): Unit = {
    import spark.implicits._
    val df = edges.toDF("doc_a", "doc_b")
    val (labelsDf, forestDf) = PipelineOps.ccWithForest(df, bound)
    val labels = labelsDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == oracleLabels(edges), s"$name: labels diverge from oracle")
    val forest = forestDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val edgeSet = edges.toSet
    assert(forest.forall(edgeSet.contains), s"$name: forest must be input rows")
    assert(forest.distinct.size == forest.size, s"$name: duplicate forest edges")
    // per component: spanning tree size
    val members = labels.groupBy(_._2).view.mapValues(_.size).toMap
    val fPerComp = forest.groupBy(e => labels(e._1)).view.mapValues(_.size).toMap
    for ((l, n) <- members; if n > 1 || fPerComp.contains(l)) {
      // self-loop-only singletons have no forest edge; every other
      // component needs exactly n-1
      val f = fPerComp.getOrElse(l, 0)
      val expected = if (n == 1) 0 else n - 1
      assert(f == expected, s"$name: component $l has $f forest edges for $n members")
    }
    // spanning: the forest alone reproduces the labels (for components
    // with edges; singletons label themselves either way)
    assert(forest.forall(e => labels(e._1) == labels(e._2)),
      s"$name: forest edge crosses components")
    assert(oracleLabels(forest).forall { case (n, l) => labels(n) == l },
      s"$name: forest does not span its components")
  }

  for ((name, edges) <- Shapes) {
    test(s"ccWithForest driver tail on $name: labels + spanning forest") {
      checkForest(edges, Long.MaxValue, name)
    }
    test(s"ccWithForest distributed Borůvka on $name: labels + spanning forest") {
      checkForest(edges, 0L, name)
    }
    test(s"ccWithForest HYBRID finish (bound 8) on $name: labels + spanning forest") {
      // every shape exceeds 8 edges → distributed entry; Borůvka rounds
      // run until the inter-component residual fits 8 rows, then the
      // driver union-find finish takes over — the mid-loop transition
      // is the thing under test
      checkForest(edges, 8L, name)
    }
  }

  test("ccWithForest on STRING ids: the driver tail can never take these — " +
    "the distributed Borůvka path must still label canonically and span") {
    import spark.implicits._
    // two components + a reversed duplicate; lexicographic minima are the labels
    val edges = Seq(
      ("alpha", "beta"), ("beta", "gamma"), ("gamma", "alpha"), ("beta", "alpha"),
      ("x1", "x2"), ("x2", "x3"))
    val df = edges.toDF("doc_a", "doc_b")
    val (labelsDf, forestDf) = PipelineOps.ccWithForest(df, Long.MaxValue)
    val labels = labelsDf.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(labels == Map(
      "alpha" -> "alpha", "beta" -> "alpha", "gamma" -> "alpha",
      "x1" -> "x1", "x2" -> "x1", "x3" -> "x1"))
    val forest = forestDf.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(forest.forall(edges.toSet.contains))
    assert(forest.distinct.size == forest.size)
    val perComp = forest.groupBy(e => labels(e._1)).view.mapValues(_.size).toMap
    assert(perComp == Map("alpha" -> 2, "x1" -> 2))
    assert(forest.forall(e => labels(e._1) == labels(e._2)))
  }
}
