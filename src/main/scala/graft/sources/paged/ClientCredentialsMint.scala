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
                            clientSecret: String)

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
    val basic = java.util.Base64.getEncoder.encodeToString(
      s"$clientId:$clientSecret".getBytes(UTF_8))
    val reply = transport.post(tokenUrl,
      Map("Authorization" -> s"Basic $basic",
          "Content-Type" -> "application/x-www-form-urlencoded"),
      "grant_type=client_credentials")
    reply.status match {
      case ok if ok >= 200 && ok < 300 =>
        val j = JsonMethods.parse(reply.body)
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
      case s if s >= 500 =>
        throw new java.io.IOException(s"token endpoint error $s: $tokenUrl")
      case s => throw new IllegalStateException(
        s"token mint refused ($s) by $tokenUrl — check client credentials")
    }
  }
}
