package graft.server

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.TpchStar
import graft.SparkTestSession.{spark, SfDir}

/** Cross-replica response-cache semantics over a shared directory — the
  * deployment shape the reference gets from Redis (util.rs:152-216):
  * replica A's computed response must be served by replica B without
  * recomputation, and /flush on either must drop the shared entries. */
class SharedCacheSpec extends AnyFunSuite {

  private val client = HttpClient.newHttpClient()
  private def get(port: Int, pathAndQuery: String): (Int, String) = {
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(s"http://localhost:$port$pathAndQuery")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }
  private def replica(dir: Path): GraftServer =
    new GraftServer(spark, TpchStar.schema, new TpchStar.Resolver(SfDir),
      flushSecret = Some("s"),
      responseCache = new SharedFileResponseCache(dir))

  test("backend round-trips and survives a second instance on the same dir") {
    val dir = Files.createTempDirectory("graft-cache")
    val a = new SharedFileResponseCache(dir)
    val k = a.key("/data.csv", Map("cube" -> Seq("Sales")))
    a.put(k, ("body,rows\n1,2", "text/csv"))
    assert(a.get(k).contains(("body,rows\n1,2", "text/csv")))
    val b = new SharedFileResponseCache(dir) // second replica, same storage
    assert(b.get(k).contains(("body,rows\n1,2", "text/csv")))
    b.clear()
    assert(a.get(k).isEmpty, "clear must be visible to every replica")
  }

  test("cache key is injective: repeated params never collide with comma-joined ones") {
    val dir = Files.createTempDirectory("graft-cache")
    val c = new SharedFileResponseCache(dir)
    // ?cuts=Year.2020&cuts=Year.2021 (intersection) vs ?cuts=Year.2020,Year.2021
    // (one comma-joined cut) are different requests — their keys must differ
    val repeated = c.key("/data.csv", Map("cuts" -> Seq("Year.2020", "Year.2021")))
    val joined   = c.key("/data.csv", Map("cuts" -> Seq("Year.2020,Year.2021")))
    assert(repeated != joined)
    // separators inside values can't forge another param's boundary either
    val forged = c.key("/data.csv", Map("a" -> Seq("1&b=2")))
    val honest = c.key("/data.csv", Map("a" -> Seq("1"), "b" -> Seq("2")))
    assert(forged != honest)
    // ORDER-PRESERVING: the logic-layer fan-out's combo order (hence the
    // response's consolidated headers) follows URL param order, so
    // ?Region=0&Nation=5 and ?Nation=5&Region=0 are different requests —
    // a sorted key would serve one order's body for the other
    import scala.collection.immutable.ListMap
    val regionFirst = c.key("/data.csv", ListMap("Region" -> Seq("0"), "Nation" -> Seq("5")))
    val nationFirst = c.key("/data.csv", ListMap("Nation" -> Seq("5"), "Region" -> Seq("0")))
    assert(regionFirst != nationFirst)
    // value order within one param is order-sensitive too (drilldown order
    // is column order)
    assert(c.key("/d", ListMap("drilldowns" -> Seq("a", "b"))) !=
      c.key("/d", ListMap("drilldowns" -> Seq("b", "a"))))
  }

  test("eviction caps entries by oldest mtime; orphaned tmp files are swept") {
    val dir = Files.createTempDirectory("graft-cache")
    val c = new SharedFileResponseCache(dir, maxEntries = 5, evictEvery = 1)
    for (i <- 1 to 9) {
      c.put(s"k$i", (s"body$i", "text/csv"))
      // distinct mtimes so the oldest-first eviction order is deterministic
      Thread.sleep(5)
    }
    val left = { val s = Files.list(dir); try s.toArray.length finally s.close() }
    assert(left <= 5, s"eviction must cap the entry count, found $left")
    assert(c.get("k9").isDefined && c.get("k1").isEmpty, "oldest evicted, newest kept")
    // an orphaned temp file from a crashed put is swept once it ages out
    val orphan = Files.createTempFile(dir, "put", ".tmp")
    Files.setLastModifiedTime(orphan,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 120000))
    c.put("k10", ("body10", "text/csv"))
    assert(!Files.exists(orphan), "aged tmp orphan must be swept on put")
  }

  test("replica B serves replica A's cached response; flush drops it") {
    val dir = Files.createTempDirectory("graft-cache")
    val q = "/data?cube=Sales&drilldowns=Region&measures=Quantity"
    val srvA = replica(dir); val portA = srvA.start()
    val srvB = replica(dir); val portB = srvB.start()
    try {
      val fromA = get(portA, q)
      assert(fromA._1 == 200, fromA._2.take(200))
      // tamper with the single cached entry: if B recomputed instead of
      // reading the shared cache, the tampered body could not come back
      val entries = Files.list(dir).filter(_.toString.endsWith(".resp")).toArray
        .map(_.asInstanceOf[Path])
      assert(entries.length == 1, s"expected one cached entry, got ${entries.length}")
      val original = Files.readString(entries.head)
      val tampered = original.replaceFirst("\n", "\n#tampered ")
      Files.writeString(entries.head, tampered)
      val fromB = get(portB, q)
      assert(fromB._1 == 200 && fromB._2.startsWith("#tampered "),
        "replica B must serve the shared cached body: " + fromB._2.take(120))
      // flush on B clears the shared dir; A then recomputes the real answer
      assert(get(portB, "/flush?secret=s")._1 == 200)
      val recomputed = get(portA, q)
      assert(recomputed._1 == 200 && recomputed._2 == fromA._2)
    } finally { srvA.stop(); srvB.stop() }
  }
}
