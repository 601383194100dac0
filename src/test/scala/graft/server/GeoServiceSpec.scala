package graft.server

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.{InetSocketAddress, URI}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.TpchStar
import graft.plan.HttpGeoService
import graft.SparkTestSession.{spark, SfDir}

/** Geo-dim `neighbors` cut ops against an in-process stand-in for the
  * reference's geoservice sidecar (geoservice.rs wire format) — spatial
  * adjacency the hierarchy could never produce — plus the hierarchy
  * fallback when no service is configured. */
class GeoServiceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var stub: HttpServer = _
  private var stubPort = 0
  private val client = HttpClient.newHttpClient()

  override def beforeAll(): Unit = {
    stub = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    // GET /geo/neighbors/{id} -> fixed "spatial" adjacency: ids 9 and 21
    stub.createContext("/geo/neighbors/", (ex: HttpExchange) => {
      val id = ex.getRequestURI.getPath.stripPrefix("/geo/neighbors/")
      val body = s"""[{"geoid":"9","level":"Nation"},{"geoid":"21","level":"Nation"},{"geoid":"$id","level":"Nation"}]"""
      val bytes = body.getBytes("UTF-8")
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    stub.start()
    stubPort = stub.getAddress.getPort
  }
  override def afterAll(): Unit = if (stub != null) stub.stop(0)

  private def get(port: Int, pathAndQuery: String): (Int, String) = {
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(s"http://localhost:$port$pathAndQuery")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("HttpGeoService parses the sidecar wire format") {
    val gs = new HttpGeoService(s"http://127.0.0.1:$stubPort/geo")
    assert(gs.neighbors("3") == Seq("9", "21", "3"))
  }

  test("HttpGeoService failures surface as PlanError (400 to the client), not 500s") {
    // non-200 and malformed payloads both become PlanError, which the
    // server maps to a 400 with the message — never an opaque 500
    stub.createContext("/bad404/neighbors/", (ex: HttpExchange) => {
      ex.sendResponseHeaders(404, -1); ex.close()
    })
    stub.createContext("/badjson/neighbors/", (ex: HttpExchange) => {
      val b = """{"not":"an array"}""".getBytes("UTF-8")
      ex.sendResponseHeaders(200, b.length); ex.getResponseBody.write(b); ex.close()
    })
    val e404 = intercept[graft.plan.PlanError](
      new HttpGeoService(s"http://127.0.0.1:$stubPort/bad404").neighbors("3"))
    assert(e404.message.contains("404"))
    val eJson = intercept[graft.plan.PlanError](
      new HttpGeoService(s"http://127.0.0.1:$stubPort/badjson").neighbors("3"))
    assert(eJson.message.contains("non-array"))
    // ids with spaces percent-encode as path segments (%20, not '+')
    var seen: String = null
    stub.createContext("/seg/neighbors/", (ex: HttpExchange) => {
      seen = ex.getRequestURI.getRawPath.stripPrefix("/seg/neighbors/")
      val b = "[]".getBytes("UTF-8")
      ex.sendResponseHeaders(200, b.length); ex.getResponseBody.write(b); ex.close()
    })
    assert(new HttpGeoService(s"http://127.0.0.1:$stubPort/seg").neighbors("New York") == Nil)
    assert(seen == "New%20York", s"got '$seen'")
  }

  test("a DOWN geoservice surfaces a typed 400, never a hang or a 500 stack") {
    // port 1 on loopback: immediate connection-refused — the sidecar-down
    // case (reference propagates query_geoservice errors as handler-level
    // errors, logic_layer/aggregate.rs:1210-1213)
    val gs = new HttpGeoService("http://127.0.0.1:1/geo")
    val e = intercept[graft.plan.PlanError](gs.neighbors("3"))
    assert(e.message.contains("geoservice request failed"), e.message)
    val srv = new GraftServer(spark, TpchStar.schema, new TpchStar.Resolver(SfDir),
      geoService = Some(gs))
    val p = srv.start()
    try {
      val (code, body) = get(p, "/relations.csv?cube=Sales&Nation=3:neighbors")
      assert(code == 400 && body.contains("geoservice request failed"), s"$code $body")
    } finally srv.stop()
  }

  test("Geo-dim neighbors resolve via the geoservice; hierarchy fallback without one") {
    // Geography is DimensionType.Geo, so a configured geoservice owns its
    // neighbors resolution (reference aggregate.rs:1204-1222)
    val gs = new HttpGeoService(s"http://127.0.0.1:$stubPort/geo")
    val geoSrv = new GraftServer(spark, TpchStar.schema, new TpchStar.Resolver(SfDir),
      geoService = Some(gs))
    val geoPort = geoSrv.start()
    try {
      val (code, body) = get(geoPort, "/relations.csv?cube=Sales&Nation=3:neighbors")
      assert(code == 200, body.take(200))
      val values = body.trim.split("\n").toSeq.tail.map(_.split(",").last)
      assert(values == Seq("9", "21", "3"), body)
    } finally geoSrv.stop()

    // without a geoservice the hierarchy ±2 fallback answers (the reference
    // errors here; graft degrades for zero-egress deployments)
    val expected = TpchStar.planner(SfDir).relatedMembers(spark,
      graft.core.LevelName("Geography", "Geography", "Nation"), "3", "neighbors")._2
    assert(expected.nonEmpty && expected != Seq("9", "21", "3"),
      "hierarchy fallback must differ from the stub's spatial answer")
    val plainSrv = new GraftServer(spark, TpchStar.schema, new TpchStar.Resolver(SfDir))
    val plainPort = plainSrv.start()
    try {
      val (code, body) = get(plainPort, "/relations.csv?cube=Sales&Nation=3:neighbors")
      assert(code == 200, body.take(200))
      val values = body.trim.split("\n").toSeq.tail.map(_.split(",").last)
      assert(values == expected, body)
    } finally plainSrv.stop()
  }
}
