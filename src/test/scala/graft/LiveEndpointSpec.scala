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
}
