package graft.sources.paged

import java.nio.charset.StandardCharsets.UTF_8

import org.json4s._
import org.json4s.jackson.JsonMethods

/** The credential triple a DSv2 scan carries to reach a protected
  * endpoint (`tokenUrl`/`clientId`/`clientSecret` read options).
  * Serializable — it rides to executors inside [[Endpoint]]; the
  * per-JVM [[TokenProvider]] is built on arrival
  * ([[ExecutorAuth.providerFor]]), keyed by this value. */
final case class MintConfig(tokenUrl: String, clientId: String,
                            clientSecret: String) {
  /** Redacted: a case-class toString (and [[Endpoint]]'s, which embeds
    * this) otherwise prints the secret verbatim into any log, plan
    * string, or debug dump that renders it. */
  override def toString: String = s"MintConfig($tokenUrl,$clientId,***)"
}

/** X1: the OAuth2 client-credentials token mint — the reference's
  * `get_token` (01_TestingPy/Spotify_API.py:16-40). POSTs `tokenUrl`
  * with `Authorization: Basic base64(client_id:client_secret)` (the
  * `b64encode` at Spotify_API.py:21) and form body
  * `grant_type=client_credentials` (Spotify_API.py:28), then reads
  * `{"access_token": ..., "expires_in": seconds}` back.
  *
  * Status discipline mirrors [[RestPageClient]]'s: 5xx raises
  * IOException (transient — the mint runs inside [[RetryingClient]]'s
  * `auth.token` pre-call, so its bounded retry applies), anything else
  * non-2xx raises IllegalStateException and fails the scan fast —
  * replaying the same credentials cannot turn a 401/400 into a token
  * (the reference likewise hard-fails, Spotify_API.py:36-39).
  *
  * The mint goes through the plain shared transport, not the endpoint's
  * token bucket: the token host is a different endpoint from the data
  * host (accounts vs api in the reference), and a mint happens once per
  * ttl per executor — not a pacing concern.
  */
final class ClientCredentialsMint(transport: HttpTransport, tokenUrl: String,
                                  clientId: String, clientSecret: String)
    extends (() => (String, Long)) with Serializable {

  /** Fallback when the endpoint omits `expires_in` (RECOMMENDED but
    * optional in OAuth2) — the reference endpoint's advertised 3600 s. */
  private val DefaultExpiresSec = 3600L

  override def apply(): (String, Long) = {
    // RFC 6749 §2.3.1: each credential is form-urlencoded BEFORE the
    // ':'-join and base64 — an id/secret containing ':' or non-ASCII is
    // otherwise ambiguous on the wire. Identity on the alphanumeric
    // credentials the reference endpoint issues, so this still matches
    // the reference's raw b64encode (Spotify_API.py:21) byte-for-byte
    // on every credential that endpoint can hand out.
    def formEnc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    val basic = java.util.Base64.getEncoder.encodeToString(
      s"${formEnc(clientId)}:${formEnc(clientSecret)}".getBytes(UTF_8))
    val reply = transport.post(tokenUrl,
      Map("Authorization" -> s"Basic $basic",
          "Content-Type" -> "application/x-www-form-urlencoded"),
      "grant_type=client_credentials")
    reply.status match {
      case ok if ok >= 200 && ok < 300 =>
        // A 2xx with a body that isn't JSON is deterministic — Jackson's
        // JsonParseException extends IOException, which RetryingClient
        // would replay maxRetries times for nothing. Rethrow as the
        // fail-fast class (same discipline as a changed envelope).
        val j = try JsonMethods.parse(reply.body) catch {
          case e: Exception => throw new IllegalStateException(
            s"malformed JSON in mint reply from $tokenUrl: ${e.getMessage}")
        }
        val token = j \ "access_token" match {
          case JString(t) if t.nonEmpty => t
          case _ => throw new IllegalStateException(
            s"no access_token in mint reply from $tokenUrl")
        }
        val ttlSec = j \ "expires_in" match {
          case JInt(n)    => n.toLong
          case JLong(n)   => n
          case JDouble(n) => n.toLong // some endpoints serialize 3600.0
          case _          => DefaultExpiresSec
        }
        (token, ttlSec * 1000L)
      case 429 =>
        // Token endpoints rate-limit too; the catch-all below would read
        // a 429 as "check client credentials" and fail the scan fast.
        // Same transient treatment as the data path: RetryingClient
        // pauses for the server's Retry-After, else backs off, then
        // replays the mint.
        throw new RateLimitedException(reply.retryAfterMs, tokenUrl)
      case s if s >= 500 =>
        throw new java.io.IOException(s"token endpoint error $s: $tokenUrl")
      case s => throw new IllegalStateException(
        s"token mint refused ($s) by $tokenUrl — check client credentials")
    }
  }
}
