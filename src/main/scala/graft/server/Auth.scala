package graft.server

import javax.crypto.spec.SecretKeySpec
import io.jsonwebtoken.Jwts
import graft.core.Cube

/** JWT auth-level gate (reference tesseract-server/src/auth.rs:17-60 +
  * handlers/util.rs:78-88): tokens are HMAC-SHA256-signed with a shared
  * secret and carry an `auth_level` claim; a cube is visible when it is
  * public or the caller's level clears its `min_auth_level`. */
final class Auth(secret: Option[String]) {

  private val key = secret.map { s =>
    new SecretKeySpec(s.getBytes("UTF-8"), "HmacSHA256")
  }

  /** Auth level carried by the token; None = no/invalid token. */
  def authLevel(token: Option[String]): Option[Int] =
    for {
      k <- key
      t <- token
      lvl <- try {
        val claims = Jwts.parser().verifyWith(k).build().parseSignedClaims(t).getPayload
        Option(claims.get("auth_level", classOf[java.lang.Integer])).map(_.intValue)
      } catch { case _: Exception => None }
    } yield lvl

  /** Whether this request may see the cube. With no secret configured, only
    * public cubes are reachable via HTTP. */
  def allowed(cube: Cube, token: Option[String]): Boolean =
    cube.public || authLevel(token).exists(_ >= cube.minAuthLevel)

  /** Test/operator helper: mint a token at the given level. */
  def mint(level: Int): Option[String] =
    key.map(k => Jwts.builder().claim("auth_level", Int.box(level)).signWith(k).compact())
}

/** Small in-memory LRU response cache keyed by the normalized request
  * (path + sorted query params) — the Redis response cache of the reference
  * (handlers/util.rs:152-216) without the external dependency. */
final class ResponseCache(maxEntries: Int = 256) {
  private val map = new java.util.LinkedHashMap[String, (String, String)](64, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, (String, String)]): Boolean =
      size() > maxEntries
  }

  def key(path: String, params: Map[String, Seq[String]]): String =
    path + "?" + params.toSeq.sortBy(_._1)
      .map { case (k, vs) => k + "=" + vs.sorted.mkString(",") }.mkString("&")

  def get(k: String): Option[(String, String)] = synchronized(Option(map.get(k)))
  def put(k: String, v: (String, String)): Unit = synchronized { map.put(k, v); () }
  def clear(): Unit = synchronized(map.clear())
}
