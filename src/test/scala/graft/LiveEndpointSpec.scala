package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.paged._

/** Smoke test of the production transport composition (throttled
  * [[JdkHttpTransport]]). Runs unconditionally: with
  * `GRAFT_LIVE_BASE_URL` set it hits that live endpoint (first
  * deployment with egress should do this once — TLS, redirects, proxy
  * plumbing); without it, it targets an in-process loopback server, so
  * the JDK transport still crosses a real socket in every CI run.
  * The full path matrix (pagination, pushdown, 401/429/5xx) lives in
  * [[LoopbackEndpointSpec]]. */
class LiveEndpointSpec extends AnyFunSuite {

  test("JdkHttpTransport round-trips (live endpoint, else loopback)") {
    def smoke(base: String): HttpReply = {
      // production composition: throttled JDK transport (reference pacing)
      val t = new TokenBucketTransport(new JdkHttpTransport())
      t.fetch(base, Map("Accept" -> "application/json"))
    }
    val reply = sys.env.get("GRAFT_LIVE_BASE_URL") match {
      case Some(live) =>
        val r = smoke(live)
        // 2xx/3xx only: a live 404/401 means the smoke is pointed at the
        // wrong URL or bad credentials — exactly what this first-
        // deployment check exists to catch, so it must NOT pass.
        // (3xx survives only when Redirect.NORMAL declines to follow,
        // e.g. https→http — reachability is still proven.)
        assert(r.status >= 200 && r.status < 400,
          s"live endpoint not OK: ${r.status}")
        r
      case None =>
        val r = LoopbackApi.withApi(api => smoke(api.base))
        assert(r.status === 200, s"loopback must serve 200: ${r.status}")
        r
    }
    info(s"smoke: ${reply.status}, ${reply.body.length} bytes, " +
      s"${reply.headers.size} headers")
  }

  test("client-credentials mint + bearer round-trip (live if credentialed, else loopback)") {
    // the X1 production composition: ClientCredentialsMint (Basic
    // base64 POST) -> TokenProvider cache -> Bearer on the page client,
    // under RetryingClient's 401-refresh. With all four GRAFT_LIVE_*
    // vars set it mints against the real token endpoint and reads the
    // live `total` (the endpoint must serve the reference's
    // `{"total": N, ...}` envelope); without them the same composition
    // runs against the credentialed loopback server, so the mint path
    // crosses a real socket in every CI run — never canceled.
    def minted(base: String, tokenUrl: String, id: String, secret: String): Long = {
      val auth = new TokenProvider(mint = Some(
        new ClientCredentialsMint(new JdkHttpTransport(), tokenUrl, id, secret)))
      new RetryingClient(
        new RestPageClient(new JdkHttpTransport(), base, auth),
        auth = auth).total(None)
    }
    (sys.env.get("GRAFT_LIVE_BASE_URL"), sys.env.get("GRAFT_LIVE_TOKEN_URL"),
     sys.env.get("GRAFT_LIVE_CLIENT_ID"),
     sys.env.get("GRAFT_LIVE_CLIENT_SECRET")) match {
      case (Some(b), Some(tu), Some(ci), Some(cs)) =>
        val n = minted(b, tu, ci, cs)
        assert(n >= 0, s"live credentialed total must parse: $n")
        info(s"live credentialed smoke: total=$n")
      case _ =>
        LoopbackApi.withCredentialedApi("live-id", "live-secret") { api =>
          assert(minted(api.base, api.tokenUrl, "live-id", "live-secret") === 100L)
          assert(api.mintCount.get() === 1, "exactly one credential exchange")
        }
    }
  }
}
