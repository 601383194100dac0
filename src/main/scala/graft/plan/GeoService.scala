package graft.plan

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Resolves geo relations for `Geography=id:neighbors` cuts on Geo-typed
  * dimensions. The reference delegates these to an external geoservice
  * HTTP sidecar (tesseract-server/src/handlers/logic_layer/geoservice.rs,
  * wired at logic_layer/aggregate.rs:1204-1222 and relations.rs:312-345) —
  * spatial adjacency can't be derived from a hierarchy table. Non-geo
  * dimensions always resolve through the hierarchy (cache.rs neighbors
  * maps), which [[CubePlanner.relatedMembers]] implements. */
trait GeoService {
  /** Geo-ids adjacent to `geoId` (reference `GET {base}/neighbors/{id}`). */
  def neighbors(geoId: String): Seq[String]

  /** Stable identity for cache fingerprints (default toString carries an
    * object hash that differs per JVM — override to something value-like). */
  def describe: String = getClass.getName
}

/** JDK-HttpClient port of the reference's geoservice client
  * (geoservice.rs:29-75): `GET {base}/neighbors/{id}` returning a JSON
  * array of `{"geoid": "...", "level": "..."}` rows; the geoids become the
  * cut members. Deployments configure it with GRAFT_GEOSERVICE_URL
  * (mirroring TESSERACT_GEOSERVICE_URL). */
final class HttpGeoService(baseUrl: String) extends GeoService {
  // bounded timeouts: a hung sidecar must fail the one query, not pin a
  // server request thread forever
  private val client = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(5)).build()
  private val base = if (baseUrl.endsWith("/")) baseUrl else baseUrl + "/"

  override def describe: String = s"HttpGeoService($base)"

  def neighbors(geoId: String): Seq[String] = {
    // URLEncoder emits form encoding ('+' for space) but this is a PATH
    // segment, where '+' is literal — percent-encode the space instead
    val seg = URLEncoder.encode(geoId, StandardCharsets.UTF_8).replace("+", "%20")
    val uri = URI.create(base + "neighbors/" + seg)
    // a down/unreachable sidecar is a typed plan error (the reference
    // propagates geoservice failures as handler-level errors, aggregate.rs
    // `query_geoservice(...)?` → 400 json), never a raw 500 stack
    val resp =
      try client.send(
        HttpRequest.newBuilder(uri).timeout(java.time.Duration.ofSeconds(15)).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      catch {
        case e: java.io.IOException => // covers connect-refused + timeouts
          throw PlanError(s"geoservice request failed for $uri: ${e.getClass.getSimpleName}")
      }
    if (resp.statusCode() != 200)
      throw PlanError(s"geoservice returned ${resp.statusCode()} for $uri")
    JsonMethods.parse(resp.body()) match {
      case JArray(rows) => rows.map { r =>
        r \ "geoid" match {
          case JString(id) => id
          case other       => throw PlanError(s"geoservice row missing geoid: $other")
        }
      }
      case other => throw PlanError(s"geoservice returned non-array payload: ${other.getClass.getSimpleName}")
    }
  }
}
