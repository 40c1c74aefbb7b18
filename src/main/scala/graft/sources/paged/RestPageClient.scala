package graft.sources.paged

import org.json4s._
import org.json4s.jackson.JsonMethods

/** One-method HTTP seam — the piece a deployment supplies to point the
  * connector at a real endpoint. Everything above it (partition
  * planning, pushdown, pagination, retry, re-auth) is transport-agnostic
  * and already spec-tested against the synthetic backends.
  *
  * Returns (status, body); implementations must NOT throw on non-2xx —
  * [[RestPageClient]] maps status codes to the retry semantics
  * ([[UnauthorizedException]] for 401 → token refresh, IOException for
  * 429/5xx → bounded retry) that [[RetryingClient]] expects.
  */
trait HttpTransport {
  def get(url: String, headers: Map[String, String]): (Int, String)

  /** Full reply including response headers (needed for `Retry-After` on
    * 429). Default adapts [[get]] with no response headers so existing
    * transports keep working; transports that can surface headers (the
    * JDK one) override this. */
  def fetch(url: String, headers: Map[String, String]): HttpReply = {
    val (status, body) = get(url, headers)
    HttpReply(status, body)
  }

  /** POST with a body — the verb the client-credentials token mint
    * needs ([[ClientCredentialsMint]]); page traffic is all GET. The
    * default refuses: a canned GET-only spec transport stays a valid
    * [[HttpTransport]], and wiring a minting [[TokenProvider]] to a
    * transport that cannot actually POST fails loudly at the first mint
    * instead of silently sending nothing. The JDK transport overrides. */
  def post(url: String, headers: Map[String, String],
           body: String): HttpReply =
    throw new UnsupportedOperationException(
      s"transport ${getClass.getName} is GET-only; token minting needs post()")
}

/** A transport response. `headers` keys are lower-cased on construction
  * by transports that override [[HttpTransport.fetch]]. */
final case class HttpReply(status: Int, body: String,
                           headers: Map[String, String] = Map.empty) {
  /** `Retry-After` in milliseconds (seconds form only — the form the
    * reference endpoint sends), None when absent/unparseable. Shared by
    * the data path's and the token mint's 429 handling so the two can't
    * silently diverge. */
  def retryAfterMs: Option[Long] = headers.get("retry-after")
    .flatMap(v => scala.util.Try(v.trim.toLong * 1000L).toOption)
}

/** JDK-11+ `java.net.http` transport — the production default. No
  * third-party dependency; per-executor instances are cheap (the JDK
  * client pools connections internally). Exercised over a real loopback
  * socket by LoopbackEndpointSpec; the client-logic specs swap in a
  * canned-response transport through the same trait.
  *
  * Redirects are followed (NORMAL: http→https allowed, never the
  * reverse), matching the reference client's behavior
  * (`requests.get` follows redirects by default) — without this a 301
  * at a live endpoint would surface as an "unexpected status" failure
  * in the page client rather than the redirected page.
  */
class JdkHttpTransport(timeoutMs: Long = 30000L) extends HttpTransport {
  import java.net.http.{HttpClient, HttpRequest, HttpResponse}
  private val client = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL)
    .connectTimeout(java.time.Duration.ofMillis(timeoutMs)).build()

  override def get(url: String, headers: Map[String, String]): (Int, String) = {
    val r = fetch(url, headers)
    (r.status, r.body)
  }

  override def fetch(url: String, headers: Map[String, String]): HttpReply = {
    val b = HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofMillis(timeoutMs)).GET()
    headers.foreach { case (k, v) => b.header(k, v) }
    send(b.build())
  }

  override def post(url: String, headers: Map[String, String],
                    body: String): HttpReply = {
    val b = HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofMillis(timeoutMs))
      .POST(HttpRequest.BodyPublishers.ofString(body))
    headers.foreach { case (k, v) => b.header(k, v) }
    send(b.build())
  }

  private def send(req: HttpRequest): HttpReply = {
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    import scala.jdk.CollectionConverters._
    val hs = resp.headers().map().asScala.collect {
      case (k, vs) if !vs.isEmpty => k.toLowerCase -> vs.get(0)
    }.toMap
    HttpReply(resp.statusCode(), resp.body(), hs)
  }
}

/** [[PageClient]] over a REST endpoint with the reference's API shape
  * (cf. 01_TestingPy/Spotify_API3.py:48-83 — offset/limit pagination,
  * bearer auth, `total` in the envelope, comma-joined `ids` multi-get):
  *
  *   - `GET {base}?offset=O&limit=L[&market=M][&fields=a,b]`
  *     → `{"total": N, "items": [{"a": ..., "b": ...}, ...]}`
  *   - `GET {base}?ids=x,y,z[&fields=a,b]` → same envelope
  *
  * Field values are read as strings (the connector's row shape);
  * missing fields become nulls. Status mapping: 401 raises
  * [[UnauthorizedException]] (RetryingClient refreshes the token and
  * replays), 429 and 5xx raise IOException (bounded retry), other
  * non-2xx fail fast (a 404 won't fix itself).
  *
  * Constructor-injected transport + token provider keep this fully
  * testable without a network: RestClientSpec drives every path through
  * a canned [[HttpTransport]].
  */
class RestPageClient(transport: HttpTransport, base: String,
                     auth: TokenProvider = ExecutorAuth.provider)
    extends PageClient {

  private def encode(v: String): String =
    java.net.URLEncoder.encode(v, "UTF-8")

  private def request(params: Seq[(String, String)]): JValue = {
    val qs = params.map { case (k, v) => s"$k=${encode(v)}" }.mkString("&")
    val url = if (qs.isEmpty) base else s"$base?$qs"
    val reply =
      transport.fetch(url, Map("Authorization" -> s"Bearer ${auth.token}"))
    reply.status match {
      // A 2xx body that isn't JSON is deterministic (same bytes on every
      // replay) — but Jackson's JsonParseException extends IOException,
      // the transient class RetryingClient replays. Rethrow as the
      // fail-fast class, same as a well-formed-but-changed envelope.
      case ok if ok >= 200 && ok < 300 =>
        try JsonMethods.parse(reply.body) catch {
          case e: Exception => throw new IllegalStateException(
            s"malformed JSON from $url: ${e.getMessage}")
        }
      case 401 => throw new UnauthorizedException
      case 429 =>
        // Retry-After rides along so RetryingClient can honor the
        // server's own pacing instead of a blind backoff.
        throw new RateLimitedException(reply.retryAfterMs, url)
      case s if s >= 500 => throw new java.io.IOException(s"server error $s: $url")
      case s => throw new IllegalStateException(s"unexpected status $s: $url")
    }
  }

  private def items(j: JValue, fields: Array[String]): Seq[Array[String]] =
    (j \ "items") match {
      case JArray(rows) => rows.map { row =>
        fields.map { f =>
          row \ f match {
            case JString(s) => s
            case JNothing | JNull => null
            case other => JsonMethods.compact(JsonMethods.render(other))
          }
        }
      }
      case _ => Seq.empty
    }

  override def total(market: Option[String] = None): Long = {
    // REST APIs return the (filtered) total with any page; ask for the
    // cheapest one
    val j = request(Seq("offset" -> "0", "limit" -> "1") ++
      market.map("market" -> _))
    (j \ "total") match {
      case JInt(n) => n.toLong
      case JLong(n) => n
      // IllegalStateException, NOT IOException: a malformed/changed
      // envelope is deterministic — replaying it maxRetries times can't
      // fix it (same fail-fast discipline as an unexpected status).
      case _ => throw new IllegalStateException(s"no total in envelope from $base")
    }
  }

  override def fetchPage(offset: Long, limit: Int, market: Option[String],
                         fields: Array[String]): Seq[Array[String]] =
    items(request(Seq("offset" -> offset.toString, "limit" -> limit.toString) ++
      market.map("market" -> _) ++
      (if (fields.nonEmpty) Seq("fields" -> fields.mkString(",")) else Nil)),
      fields)

  override def fetchByIds(ids: Seq[String],
                          fields: Array[String]): Seq[Array[String]] =
    items(request(Seq("ids" -> ids.mkString(",")) ++
      (if (fields.nonEmpty) Seq("fields" -> fields.mkString(",")) else Nil)),
      fields)
}
