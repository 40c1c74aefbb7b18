package graft

import java.net.InetSocketAddress
import java.util.concurrent.{ConcurrentLinkedQueue, Executors}

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** A real loopback REST endpoint (JDK `com.sun.net.httpserver` — no
  * container dependencies) serving the reference's envelope shape
  * (`{"total": N, "items": [...]}` with offset/limit pagination, market
  * filtering, field projection, comma-joined `ids` multi-get — cf.
  * 01_TestingPy/Spotify_API3.py:48-83). Used by [[LoopbackEndpointSpec]]
  * to exercise [[JdkHttpTransport]] + [[RestPageClient]] +
  * [[RetryingClient]] + the DSv2 scan over an actual socket — the one
  * code path canned-transport specs can't reach.
  *
  * `failures` is a queue of (status, Retry-After seconds) the handler
  * pops BEFORE serving — push entries to make the next request(s) fail,
  * exercising the 401/429/5xx retry paths against real HTTP responses.
  *
  * `mangle` rewrites every 200 envelope body just before it goes on the
  * wire — lets a spec serve a malformed payload (e.g. a non-numeric
  * `popularity` cell) that the well-formed fixture can't express, to
  * prove the reader quarantines instead of crashing.
  *
  * `tokenCreds` turns on the client-credentials exchange (X1): a
  * `/api/token` route that 401s unless the `Basic` header DECODES to
  * `id:secret` (server-side decode, so a spec proves the client sent
  * genuine base64 — cf. 01_TestingPy/Spotify_API.py:16-40), mints
  * `tok-N` with `expires_in = tokenTtlSec`, and from then on the data
  * route rejects any Bearer token it did not mint (or that
  * [[revokeAll]] has revoked) with 401 — so an end-to-end scan proves
  * the minted token, not a stub, authorized every page.
  */
final class LoopbackApi(rows: Seq[(String, String, Int, String)],
                        mangle: String => String = identity,
                        tokenCreds: Option[(String, String)] = None,
                        tokenTtlSec: Long = 3600L,
                        enforceTtl: Boolean = false)
    extends AutoCloseable {

  val requests = new ConcurrentLinkedQueue[String]()       // query strings seen
  val authHeaders = new ConcurrentLinkedQueue[String]()    // Authorization values
  val failures = new ConcurrentLinkedQueue[(Int, Option[Long])]()
  val redirectHits = new java.util.concurrent.atomic.AtomicInteger(0)
  val mintCount = new java.util.concurrent.atomic.AtomicInteger(0)
  /** Data-route 401 replies actually sent — the observable a
    * proactive-refresh spec asserts is zero across a ttl boundary. */
  val unauthorizedCount = new java.util.concurrent.atomic.AtomicInteger(0)
  // token -> server-side expiry ms (MaxValue unless enforceTtl: most
  // specs drive CLIENT-side expiry and must not race a server clock)
  private val liveTokens =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Server-side revocation: every previously minted token turns
    * invalid, so the next data request 401s and the client must re-mint
    * (the mid-scan expiry/refresh path, Spotify_API.py:54-57). */
  def revokeAll(): Unit = liveTokens.clear()

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/v1/things", new Handler)
  tokenCreds.foreach { case (id, secret) =>
    server.createContext("/api/token", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val body = new String(x.getRequestBody.readAllBytes(), "UTF-8")
        val auth = Option(x.getRequestHeaders.getFirst("Authorization"))
          .getOrElse("")
        // decode, don't re-encode-and-compare: this proves the client's
        // header is real base64 of id:secret, not merely the same bytes
        // both sides would produce from a shared (possibly broken)
        // encoder. RFC 6749 §2.3.1 server-side algorithm: split the
        // decoded bytes on the FIRST ':' and form-urldecode each part —
        // accepts both the plain alphanumeric credential (urlencoding is
        // identity) and one carrying ':'/'+'/'%'/non-ASCII.
        val decodedPair: Option[(String, String)] =
          if (auth.startsWith("Basic "))
            scala.util.Try {
              val raw = new String(java.util.Base64.getDecoder
                .decode(auth.stripPrefix("Basic ")), "UTF-8")
              raw.split(":", 2) match {
                case Array(u, p) =>
                  (java.net.URLDecoder.decode(u, "UTF-8"),
                    java.net.URLDecoder.decode(p, "UTF-8"))
              }
            }.toOption
          else None
        if (x.getRequestMethod != "POST")
          respond(x, 405, """{"error":"POST only"}""")
        else if (!decodedPair.contains((id, secret)))
          respond(x, 401, """{"error":"invalid_client"}""")
        else if (!body.contains("grant_type=client_credentials"))
          respond(x, 400, """{"error":"unsupported_grant_type"}""")
        else {
          val t = s"tok-${mintCount.incrementAndGet()}"
          liveTokens.put(t, if (enforceTtl)
            System.currentTimeMillis() + tokenTtlSec * 1000L
          else java.lang.Long.MAX_VALUE)
          respond(x, 200, s"""{"access_token":"$t","token_type":"Bearer","expires_in":$tokenTtlSec}""")
        }
      }
    })
  }
  // A moved-endpoint alias: every request here gets a 301 to the real
  // context (query string preserved) — exercises the transport's
  // redirect-following (Redirect.NORMAL), which nothing else executes.
  server.createContext("/old/things", new HttpHandler {
    override def handle(x: HttpExchange): Unit = {
      redirectHits.incrementAndGet()
      val q = Option(x.getRequestURI.getRawQuery).map("?" + _).getOrElse("")
      x.getResponseHeaders.add("Location", s"$base$q")
      x.sendResponseHeaders(301, -1) // no body
      x.close()
    }
  })
  server.setExecutor(Executors.newFixedThreadPool(4))
  server.start()

  def base: String = s"http://127.0.0.1:${server.getAddress.getPort}/v1/things"
  def movedBase: String = s"http://127.0.0.1:${server.getAddress.getPort}/old/things"
  def tokenUrl: String = s"http://127.0.0.1:${server.getAddress.getPort}/api/token"
  def queries: Seq[String] = requests.asScala.toSeq
  override def close(): Unit = server.stop(0)

  private def respond(x: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    x.getResponseHeaders.add("Content-Type", "application/json")
    x.sendResponseHeaders(status, bytes.length)
    val os = x.getResponseBody
    try os.write(bytes) finally os.close()
    x.close()
  }

  private final class Handler extends HttpHandler {
    override def handle(x: HttpExchange): Unit = {
      // RAW query: URI.getQuery percent-decodes, and the split/decode in
      // envelope() below would then decode a SECOND time (corrupting any
      // value containing '%' or '+', and mis-splitting an encoded '&').
      // Raw in, split on the wire-level separators, decode each part once.
      val q = Option(x.getRequestURI.getRawQuery).getOrElse("")
      requests.add(q)
      val authz = Option(x.getRequestHeaders.getFirst("Authorization")).getOrElse("")
      authHeaders.add(authz)
      failures.poll() match {
        case null =>
          // credentialed mode: only tokens THIS server minted (and has
          // not revoked, and — under enforceTtl — not yet expired) may
          // read data; a stub/stale token gets the 401 a real API sends
          val live = Option(liveTokens.get(authz.stripPrefix("Bearer ")))
            .exists(_ > System.currentTimeMillis())
          if (tokenCreds.isDefined && !live) {
            unauthorizedCount.incrementAndGet()
            respond(x, 401, """{"error":"invalid_token"}""")
          } else respond(x, 200, mangle(envelope(q)))
        case (status, retryAfterSec) =>
          retryAfterSec.foreach(s => x.getResponseHeaders.add("Retry-After", s.toString))
          respond(x, status, s"""{"error":$status}""")
      }
    }

    private def envelope(q: String): String = {
      val params = q.split("&").filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        java.net.URLDecoder.decode(k, "UTF-8") ->
          java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap
      val filtered = params.get("market").fold(rows)(m => rows.filter(_._4 == m))
      val selected = params.get("ids") match {
        case Some(ids) =>
          val want = ids.split(",").toSet
          filtered.filter(r => want(r._1))
        case None =>
          val off = params.getOrElse("offset", "0").toInt
          val lim = params.getOrElse("limit", "50").toInt
          filtered.slice(off, off + lim)
      }
      val fields = params.get("fields").map(_.split(",").toSeq)
        .getOrElse(Seq("id", "name", "popularity", "market"))
      val items = selected.map { r =>
        fields.map {
          case "id"         => s""""id":"${r._1}""""
          case "name"       => s""""name":"${r._2}""""
          case "popularity" => s""""popularity":${r._3}"""
          case "market"     => s""""market":"${r._4}""""
          case other        => s""""$other":null"""
        }.mkString("{", ",", "}")
      }.mkString("[", ",", "]")
      s"""{"total":${filtered.size},"items":$items}"""
    }
  }
}

object LoopbackApi {
  /** 100 rows over 3 markets — 2 pages at the default pageSize 50. */
  def fixtureRows: Seq[(String, String, Int, String)] =
    (0 until 100).map(i =>
      (s"id$i", s"name$i", i % 97, Seq("ID", "US", "JP")(i % 3)))

  def withApi[T](f: LoopbackApi => T): T = {
    val api = new LoopbackApi(fixtureRows)
    try f(api) finally api.close()
  }

  /** Like [[withApi]] but with an envelope-mangling rewrite installed. */
  def withMangledApi[T](mangle: String => String)(f: LoopbackApi => T): T = {
    val api = new LoopbackApi(fixtureRows, mangle)
    try f(api) finally api.close()
  }

  /** Like [[withApi]] but credentialed: the token route is live and the
    * data route demands a token it minted (see class doc). `enforceTtl`
    * additionally expires tokens SERVER-side at mint + ttl — the mode
    * the proactive-refresh spec needs (most specs leave it off: they
    * drive client-side expiry and must not race a server clock). */
  def withCredentialedApi[T](id: String, secret: String,
                             tokenTtlSec: Long = 3600L,
                             enforceTtl: Boolean = false)
                            (f: LoopbackApi => T): T = {
    val api = new LoopbackApi(fixtureRows, identity,
      tokenCreds = Some((id, secret)), tokenTtlSec = tokenTtlSec,
      enforceTtl = enforceTtl)
    try f(api) finally api.close()
  }
}
