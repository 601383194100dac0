package graft.plan

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core._
import graft.engine.TpchStar
import graft.streaming.SummaryRefresh
import graft.SparkTestSession.{spark, SfDir}

/** The streamed summary serves the router: [[SummaryRefresh.runFold]]
  * maintains a Preagg store-schema summary across fact micro-batches
  * (per-chunk [[Preagg.summaryFrame]] partials folded by
  * [[Preagg.mergeSummaries]]), and the resulting store is handed — with no
  * rebuild, no fact rescan — to the SAME [[PreaggPlanner]] /
  * [[LogicLayer]] routing a batch-materialized summary uses. Closes the
  * loop the two features were built for: a continuously-ingesting fact
  * whose dashboard traffic never touches the fact. */
class StreamedPreaggSpec extends AnyFunSuite {

  private def die(m: String): Nothing = throw PlanError(m)
  private def drill(s: String) = Drilldown.parse(s).fold(die, identity)
  private def mea(s: String) = MeasureName.parse(s).fold(die, identity)
  private def cut(s: String) = CutSpec.parse(s).fold(die, identity)

  private val base = TpchStar.planner(SfDir)
  private val grain = Seq(
    LevelName("Geography", "Geography", "Nation"),
    LevelName("Ship Date", "Ship Date", "Year"))

  test("a SummaryRefresh-maintained summary serves PreaggPlanner and LogicLayer routing") {
    val tmp = Files.createTempDirectory("graft_stream_preagg")
    val watch = s"$tmp/facts"
    val store = s"$tmp/streamed_nation_year"
    val ckpt = s"$tmp/ckpt"
    Files.createDirectories(Paths.get(watch))

    // facade dataset dir: the real dims, the fact slot rewritten per batch —
    // so each chunk's partials come from the UNCHANGED planner machinery
    val facade = s"$tmp/facade"
    Files.createDirectories(Paths.get(facade))
    for (t <- Seq("region", "nation", "supplier", "customer", "orders", "part"))
      Files.createSymbolicLink(
        Paths.get(s"$facade/$t.parquet"), Paths.get(s"$SfDir/$t.parquet"))

    // three fact chunks (one file each → one micro-batch each)
    val fact = spark.read.parquet(s"$SfDir/lineitem.parquet")
    val chunks = Seq(
      fact.where(col("l_orderkey") % 3 === 0),
      fact.where(col("l_orderkey") % 3 === 1),
      fact.where(col("l_orderkey") % 3 === 2))
    chunks.zipWithIndex.foreach { case (c, i) =>
      // one flat file per chunk in the watched root → one micro-batch each
      val stage = s"$tmp/stage$i"
      c.coalesce(1).write.parquet(stage)
      val part = Files.list(Paths.get(stage)).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).getOrElse(fail(s"no part file in $stage"))
      Files.move(Paths.get(part), Paths.get(s"$watch/chunk$i.parquet"))
    }

    val q = SummaryRefresh.runFold(
      spark, watch, fact.schema, store, ckpt,
      partialsOf = { batch =>
        batch.write.mode("overwrite").parquet(s"$facade/lineitem.parquet")
        Preagg.summaryFrame(spark, TpchStar.planner(facade), TpchStar.salesCube, grain)
      },
      combine = Preagg.mergeSummaries(TpchStar.salesCube, _, _))
    try q.processAllAvailable() finally q.stop()

    // the grain summary must be dim-cardinality, not fact-cardinality
    val stored = spark.read.parquet(store)
    assert(stored.count() < fact.count() / 10,
      "streamed store must be a grain summary, not a fact copy")

    val derived = Preagg.derivedCube(TpchStar.salesCube, grain, TableDef("__stream"))
    val sp = new CubePlanner(derived, new graft.sources.FormatResolver(
      Map("__stream" -> graft.sources.SourceSpec(store))))
    val pp = new PreaggPlanner(base, sp)

    def img(df: org.apache.spark.sql.DataFrame) = graft.SparkTestSession.rowImage(df)

    // q44-style rollup-above-grain + cut, sum/max and the KMV sketch measure:
    // chunk-sketch union is lossless, so the streamed store's distinct
    // estimate must EQUAL the fact-side estimate, not approximate it
    val rollup = CubeQuery(
      drilldowns = Seq(drill("Geography.Region")),
      cuts = Seq(cut("Ship Date.Year.1996,1997")),
      measures = Seq(mea("Quantity"), mea("Max Price"), mea("Unique Parts")))
    val served = pp.plan(spark, rollup)
    assert(img(served) == img(base.plan(spark, rollup)))
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("streamed_nation_year") && !plan.contains("lineitem"),
      "routing must scan the streamed store, never the fact:\n" + plan.take(800))

    // the exact-grain query and a below-grain fallback behave like PreaggSpec's
    val atGrain = CubeQuery(
      drilldowns = Seq(drill("Geography.Nation"), drill("Ship Date.Year")),
      measures = Seq(mea("Quantity"), mea("Row Count"), mea("Min Price")))
    assert(img(pp.plan(spark, atGrain)) == img(base.plan(spark, atGrain)))

    val below = CubeQuery(
      drilldowns = Seq(drill("Geography.Supplier")),
      measures = Seq(mea("Quantity")))
    val fb = pp.plan(spark, below)
    assert(img(fb) == img(base.plan(spark, below)))
    assert(fb.queryExecution.executedPlan.toString.contains("lineitem"),
      "below-grain drill must fall through to the fact")

    // the logic layer rides the streamed store too (fused fan-out default)
    val ll = new LogicLayer(base, summaries = Seq(sp))
    val llq = LogicLayerQuery(
      drilldowns = Seq(drill("Ship Date.Year")),
      cuts = Seq(cut("Geography.Region.0,2"), cut("Geography.Nation.1,2,3")),
      measures = Seq(mea("Quantity")))
    val r = ll.plan(spark, llq)
    assert(img(r) == img(new LogicLayer(base).plan(spark, llq)))
    val rp = r.queryExecution.executedPlan.toString
    assert(rp.contains("streamed_nation_year") && !rp.contains("lineitem"),
      "LL fan-out members must scan the streamed store:\n" + rp.take(800))
  }

  test("summaries ride the composed ingest bump: one bump() advances the dedup " +
       "families AND the registered Preagg store, and routed answers track the new " +
       "fact snapshot fact-scan-free") {
    import graft.streaming.IngestBump
    val tmp = Files.createTempDirectory("graft_bump_preagg")
    val root = s"$tmp/bumproot"

    // facade dataset dir (same trick as above): real dims, the fact slot
    // rewritten per delta so partials come from the unchanged planner
    val facade = s"$tmp/facade"
    Files.createDirectories(Paths.get(facade))
    for (t <- Seq("region", "nation", "supplier", "customer", "orders", "part"))
      Files.createSymbolicLink(
        Paths.get(s"$facade/$t.parquet"), Paths.get(s"$SfDir/$t.parquet"))
    val fact = spark.read.parquet(s"$SfDir/lineitem.parquet")
    val spec = IngestBump.SummarySpec(
      name = "nation_year",
      partialsOf = { delta =>
        delta.write.mode("overwrite").parquet(s"$facade/lineitem.parquet")
        Preagg.summaryFrame(spark, TpchStar.planner(facade), TpchStar.salesCube, grain)
      },
      combine = Preagg.mergeSummaries(TpchStar.salesCube, _, _))

    // a small doc corpus rides the same bumps — ONE orchestrated call per
    // ingest advances text state and the OLAP summary together
    val docs = spark.read.parquet(s"$SfDir/../sf0.001/documents.parquet")
      .select("doc_id", "text", "lang", "source", "n_chars")

    val half0 = fact.where(col("l_orderkey") % 2 === 0)
    val half1 = fact.where(col("l_orderkey") % 2 === 1)
    IngestBump.bump(spark, root, docs.where(col("doc_id") < 300),
      factDelta = Some(half0), summaries = Seq(spec))
    IngestBump.bump(spark, root, docs,
      factDelta = Some(half1), summaries = Seq(spec))

    def img(df: org.apache.spark.sql.DataFrame) = graft.SparkTestSession.rowImage(df)
    val store = IngestBump.summaryPath(spark, root, "nation_year")
      .getOrElse(fail("summary store must exist after the bumps"))
    val derived = Preagg.derivedCube(TpchStar.salesCube, grain, TableDef("__bumped"))
    val sp2 = new CubePlanner(derived, new graft.sources.FormatResolver(
      Map("__bumped" -> graft.sources.SourceSpec(store))))
    val pp = new PreaggPlanner(base, sp2)
    val rollup = CubeQuery(
      drilldowns = Seq(drill("Geography.Region")),
      cuts = Seq(cut("Ship Date.Year.1996,1997")),
      measures = Seq(mea("Quantity"), mea("Max Price"), mea("Unique Parts")))
    val served = pp.plan(spark, rollup)
    assert(img(served) == img(base.plan(spark, rollup)),
      "routed answer must equal the base planner over the FULL fact")
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("summary") && !plan.contains("lineitem"),
      "routing must scan the bump-maintained store, never the fact:\n" + plan.take(800))
    // and the text family advanced in the same calls
    val st = IngestBump.textState(spark, root).get
    assert(st("livelog").count() == docs.count())

    // REPLAY IDEMPOTENCY (the at-least-once crash-recovery contract): a
    // re-run of the already-completed second bump must fold NOTHING into
    // the committed summary — pre-guard it silently double-counted every
    // sum in every served answer
    val before = img(spark.read.parquet(
      IngestBump.summaryPath(spark, root, "nation_year").get))
    IngestBump.bump(spark, root, docs,
      factDelta = Some(half1), summaries = Seq(spec))
    val after = img(spark.read.parquet(
      IngestBump.summaryPath(spark, root, "nation_year").get))
    assert(after == before, "replayed bump must not double-count the summary")
    // the routed answer still matches the base planner after the replay
    val replayServed = pp.plan(spark, rollup)
    assert(img(replayServed) == img(base.plan(spark, rollup)))

    // an explicit bumpId overrides the content stamp: two bumps with
    // byte-identical deltas but distinct ids BOTH fold (the legit
    // consecutive-duplicate-feed case the content default cannot tell
    // from a replay)
    val root2 = s"$tmp/bumproot2"
    IngestBump.bump(spark, root2, docs.where(col("doc_id") < 300),
      factDelta = Some(half0), summaries = Seq(spec), bumpId = Some("epoch-1"))
    val one = spark.read.parquet(
        IngestBump.summaryPath(spark, root2, "nation_year").get)
      .agg(sum(col("Quantity"))).collect()(0).getDouble(0)
    IngestBump.bump(spark, root2, docs.where(col("doc_id") < 300),
      factDelta = Some(half0), summaries = Seq(spec), bumpId = Some("epoch-2"))
    val two = spark.read.parquet(
        IngestBump.summaryPath(spark, root2, "nation_year").get)
      .agg(sum(col("Quantity"))).collect()(0).getDouble(0)
    assert(math.abs(two - 2 * one) < 1e-6,
      "distinct explicit bump ids must fold both deltas")
  }
}
