package graft

import scala.jdk.CollectionConverters._

import graft.sources.paged._

/** X1: the client-credentials token mint (reference `get_token`,
  * 01_TestingPy/Spotify_API.py:16-40 — Basic base64(id:secret) at
  * line 21, `grant_type=client_credentials` at line 28, Bearer use at
  * line 44, 401-re-mint at lines 54-57). Unit half pins the exact wire
  * shape against a canned transport; loopback half proves a DSv2 scan
  * end-to-end with a MINTED (not stub) token over a real socket,
  * including mid-scan revocation → 401 → re-mint → replay, and a
  * zero-ttl endpoint forcing the expiry path.
  */
class TokenMintSpec extends SparkSpec {

  /** Canned POST-capable transport: records the one POST, returns the
    * scripted reply (with response headers, for the 429 Retry-After
    * path — keys lower-cased like [[JdkHttpTransport]] produces). */
  private final class CannedPost(status: Int, body: String,
                                 replyHeaders: Map[String, String] = Map.empty)
      extends HttpTransport {
    var posted: Option[(String, Map[String, String], String)] = None
    override def get(url: String, headers: Map[String, String]) =
      throw new IllegalStateException("mint must POST, not GET")
    override def post(url: String, headers: Map[String, String],
                      body0: String): HttpReply = {
      posted = Some((url, headers, body0))
      HttpReply(status, body, replyHeaders)
    }
  }

  test("mint POSTs Basic base64(id:secret) + grant_type and parses the reply") {
    val t = new CannedPost(200, """{"access_token":"abc","expires_in":120}""")
    val mint = new ClientCredentialsMint(t, "https://auth.example.com/api/token",
      "myid", "mysecret")
    assert(mint() === ("abc", 120000L))
    val (url, headers, body) = t.posted.get
    assert(url === "https://auth.example.com/api/token")
    // the expected base64 is an INDEPENDENT literal (python3 b64encode
    // of "myid:mysecret"), so encoder and assertion can't share a bug
    assert(headers("Authorization") === "Basic bXlpZDpteXNlY3JldA==")
    assert(headers("Content-Type") === "application/x-www-form-urlencoded")
    assert(body === "grant_type=client_credentials")
  }

  test("credentials carrying reserved chars are form-urlencoded before base64 (RFC 6749 §2.3.1)") {
    // a raw join would put TWO ':' in the decoded string and garble the
    // '+'/'%'; the expected base64 is an INDEPENDENT python3 literal:
    // b64encode(quote_plus("c:id/5") + ":" + quote_plus("s e+c%ret"))
    val t = new CannedPost(200, """{"access_token":"x","expires_in":60}""")
    new ClientCredentialsMint(t, "u", "c:id/5", "s e+c%ret")()
    assert(t.posted.get._2("Authorization")
      === "Basic YyUzQWlkJTJGNTpzK2UlMkJjJTI1cmV0")
  }

  test("429 at the token endpoint is transient: RateLimitedException w/ Retry-After") {
    // the pre-fix catch-all read a rate-limited mint as "check client
    // credentials" and failed the scan fast — token endpoints do
    // rate-limit, and the data path already treats 429 as pausable
    val e = intercept[RateLimitedException](new ClientCredentialsMint(
      new CannedPost(429, "{}", Map("retry-after" -> "2")), "u", "i", "s")())
    assert(e.retryAfterMs === Some(2000L))
    // no header -> still the pausable class; backoff supplies the wait
    assert(intercept[RateLimitedException](new ClientCredentialsMint(
      new CannedPost(429, "{}"), "u", "i", "s")()).retryAfterMs === None)
  }

  test("a rate-limited mint inside RetryingClient pauses then replays") {
    var calls = 0
    val auth = new TokenProvider(mint = Some { () =>
      calls += 1
      if (calls == 1) throw new RateLimitedException(Some(1234L), "tokUrl")
      ("tok", 60000L)
    })
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val inner = new PageClient {
      override def total(market: Option[String]) = 42L
      override def fetchPage(offset: Long, limit: Int, market: Option[String],
                             fields: Array[String]) = Seq.empty
      override def fetchByIds(ids: Seq[String], fields: Array[String]) = Seq.empty
    }
    val c = new RetryingClient(inner, auth = auth, sleeper = slept += _)
    assert(c.total(None) === 42L)
    assert(calls === 2, "the 429'd mint must be replayed, not fatal")
    assert(slept.toSeq === Seq(1234L), "the server's Retry-After paces the replay")
  }

  test("a 2xx mint reply with a non-JSON body fails fast, not retried") {
    // Jackson's JsonParseException extends IOException — unwrapped, the
    // deterministic parse failure would replay maxRetries times
    val e = intercept[IllegalStateException](new ClientCredentialsMint(
      new CannedPost(200, "<html>proxy login page</html>"), "u", "i", "s")())
    assert(e.getMessage.contains("malformed JSON"))
  }

  test("MintConfig (and anything embedding it) never renders the secret") {
    val cfg = MintConfig("https://a/t", "id9", "sekrit-value")
    assert(!cfg.toString.contains("sekrit"), cfg.toString)
    assert(cfg.toString.contains("id9"), "non-secret fields stay debuggable")
  }

  test("mint defaults expires_in to 3600s when the endpoint omits it") {
    val t = new CannedPost(200, """{"access_token":"abc"}""")
    val mint = new ClientCredentialsMint(t, "u", "i", "s")
    assert(mint() === ("abc", 3600000L))
    // and reads a float serialization (3600.0) as the number it is
    val tf = new CannedPost(200, """{"access_token":"abc","expires_in":120.0}""")
    assert(new ClientCredentialsMint(tf, "u", "i", "s")() === ("abc", 120000L))
  }

  test("mint fails fast on 4xx (bad creds are deterministic), retries 5xx") {
    // 401/400 → IllegalStateException: replaying the same credentials
    // can't mint a token, so RetryingClient must NOT burn retries on it
    val e = intercept[IllegalStateException](
      new ClientCredentialsMint(new CannedPost(401, "{}"), "u", "i", "s")())
    assert(e.getMessage.contains("401"))
    intercept[IllegalStateException](
      new ClientCredentialsMint(new CannedPost(400, "{}"), "u", "i", "s")())
    // 5xx → IOException: transient class, RetryingClient's bounded
    // retry applies because the mint runs inside its auth.token pre-call
    intercept[java.io.IOException](
      new ClientCredentialsMint(new CannedPost(503, "{}"), "u", "i", "s")())
    // a 200 with no token is a changed contract → fail fast too
    intercept[IllegalStateException](
      new ClientCredentialsMint(new CannedPost(200, """{"ok":true}"""),
        "u", "i", "s")())
  }

  test("TokenProvider caches a minted token until expiry / invalidate") {
    var mints = 0
    val p = new TokenProvider(mint = Some(() => { mints += 1; (s"t$mints", 60000L) }))
    assert(p.token === "t1")
    assert(p.token === "t1", "within ttl the cached token is reused")
    assert(mints === 1)
    p.invalidate() // the 401 path
    assert(p.token === "t2")
    assert(mints === 2)
    // ttl 0 = already expired: every call re-mints (the honest reading
    // of an endpoint that refuses to cache)
    val p0 = new TokenProvider(mint = Some(() => { mints += 1; (s"t$mints", 0L) }))
    p0.token; p0.token
    assert(mints === 4)
  }

  test("GET-only transports refuse to mint instead of silently sending nothing") {
    val getOnly = new HttpTransport {
      override def get(url: String, headers: Map[String, String]) = (200, "{}")
    }
    intercept[UnsupportedOperationException](
      new ClientCredentialsMint(getOnly, "u", "i", "s")())
  }

  test("DSv2 scan end-to-end with a minted token over a real socket") {
    LoopbackApi.withCredentialedApi("cid", "csecret") { api =>
      val df = spark.read.format("graft.sources.paged.PagedSource")
        .option("url", api.base).option("pageSize", 50)
        .option("tokenUrl", api.tokenUrl)
        .option("clientId", "cid").option("clientSecret", "csecret")
        .load()
      val got = df.collect().map(r => (r.getString(0), r.getString(1),
        r.getInt(2), r.getString(3))).sortBy(_._1)
      assert(got.toSeq === LoopbackApi.fixtureRows.sortBy(_._1))
      // exactly one credential exchange served the whole scan (planning
      // probe + 2 pages share the per-JVM cached token) and every data
      // request carried THE minted token — the server rejects any other
      assert(api.mintCount.get() === 1,
        s"one mint for the whole scan, got ${api.mintCount.get()}")
      assert(api.authHeaders.asScala.nonEmpty &&
        api.authHeaders.asScala.forall(_ === "Bearer tok-1"))
    }
  }

  test("revoked token mid-scan: 401 → re-mint → replay (the reference's refresh)") {
    LoopbackApi.withCredentialedApi("cid", "csecret") { api =>
      def read() = spark.read.format("graft.sources.paged.PagedSource")
        .option("url", api.base).option("pageSize", 50)
        .option("tokenUrl", api.tokenUrl)
        .option("clientId", "cid").option("clientSecret", "csecret")
        .load().count()
      assert(read() === 100L)
      assert(api.mintCount.get() === 1)
      api.revokeAll() // server invalidates tok-1; the client still caches it
      assert(read() === 100L,
        "the 401 must be absorbed by re-mint + replay, not fail the scan")
      assert(api.mintCount.get() === 2, "the 401 forced exactly one re-mint")
    }
  }

  test("zero-ttl endpoint drives the expiry path: every request re-mints") {
    LoopbackApi.withCredentialedApi("cid2", "csecret2", tokenTtlSec = 0L) { api =>
      val n = spark.read.format("graft.sources.paged.PagedSource")
        .option("url", api.base).option("pageSize", 50)
        .option("tokenUrl", api.tokenUrl)
        .option("clientId", "cid2").option("clientSecret", "csecret2")
        .load().count()
      assert(n === 100L)
      assert(api.mintCount.get() >= 2,
        s"expires_in=0 must force a re-mint per request, got ${api.mintCount.get()}")
    }
  }

  test("early-refresh margin: the boundary request re-mints proactively (fake clock)") {
    var now = 1000000L
    var mints = 0
    val p = new TokenProvider(
      mint = Some(() => { mints += 1; (s"t$mints", 100000L) }),
      clock = () => now)
    assert(p.token === "t1")
    now += 69999L // just inside effective expiry (ttl 100s - 30s margin)
    assert(p.token === "t1")
    assert(mints === 1)
    now += 1L // at ttl - margin: re-mint BEFORE the endpoint-side expiry
    assert(p.token === "t2")
    assert(mints === 2, "the margin mints proactively — no 401 round-trip")
    // the margin is capped at ttl/2 so a short-ttl endpoint keeps real
    // cache coverage: ttl 4s -> margin 2s, cached for 2s not 0
    var shortMints = 0
    var now2 = 0L
    val ps = new TokenProvider(
      mint = Some(() => { shortMints += 1; (s"s$shortMints", 4000L) }),
      clock = () => now2)
    assert(ps.token === "s1"); now2 = 1999L
    assert(ps.token === "s1"); now2 = 2000L
    assert(ps.token === "s2")
    assert(shortMints === 2)
  }

  test("steady load across a server-enforced ttl boundary issues no 401") {
    // the end-to-end form of the margin: the server expires tokens at
    // mint+4s; the client's margin (capped to ttl/2 = 2s) re-mints at
    // +2s, so no request ever carries a token the server has expired.
    // Without the margin the first post-boundary request is a
    // guaranteed 401 + re-mint + replay. ttl 4s (not a tighter 2s)
    // buys 2 full seconds of client-valid-but-server-fresh slack, so a
    // GC/steal stall between the client's token check and the server's
    // clock read needs to exceed 2s to flake this on a stormy host.
    LoopbackApi.withCredentialedApi("cid5", "s5", tokenTtlSec = 4L,
        enforceTtl = true) { api =>
      val auth = new TokenProvider(mint = Some(new ClientCredentialsMint(
        new JdkHttpTransport(), api.tokenUrl, "cid5", "s5")))
      val client = new RetryingClient(
        new RestPageClient(new JdkHttpTransport(), api.base, auth), auth = auth)
      val deadline = System.currentTimeMillis() + 4600L
      while (System.currentTimeMillis() < deadline) {
        assert(client.total(None) === 100L)
        Thread.sleep(50L)
      }
      assert(api.mintCount.get() >= 2,
        s"the run must cross a ttl boundary (mints=${api.mintCount.get()})")
      assert(api.unauthorizedCount.get() === 0,
        "proactive refresh means the server never saw an expired token")
    }
  }

  test("reserved-char credentials round-trip the loopback mint end-to-end") {
    // client RFC-encodes, server splits-on-first-':' and urldecodes —
    // proves the two sides implement the SAME §2.3.1 algorithm, not
    // mirrored bugs (the canned-transport test pins the exact bytes)
    LoopbackApi.withCredentialedApi("c:id/5", "s e+c%ret") { api =>
      val auth = new TokenProvider(mint = Some(new ClientCredentialsMint(
        new JdkHttpTransport(), api.tokenUrl, "c:id/5", "s e+c%ret")))
      val client = new RetryingClient(
        new RestPageClient(new JdkHttpTransport(), api.base, auth), auth = auth)
      assert(client.total(None) === 100L)
      assert(api.mintCount.get() === 1)
    }
  }

  test("wrong client secret fails the scan fast with the mint's refusal") {
    LoopbackApi.withCredentialedApi("cid3", "right") { api =>
      val auth = new TokenProvider(mint = Some(new ClientCredentialsMint(
        new JdkHttpTransport(), api.tokenUrl, "cid3", "WRONG")))
      val client = new RetryingClient(
        new RestPageClient(new JdkHttpTransport(), api.base, auth), auth = auth)
      val e = intercept[IllegalStateException](client.total(None))
      assert(e.getMessage.contains("token mint refused"))
      assert(api.mintCount.get() === 0, "nothing was minted for bad creds")
    }
  }

  test("concurrent readers share ONE mint per ttl (the per-executor S1 semantic)") {
    // 16 threads hammer token simultaneously — the documented scale
    // shape is one credential exchange per executor JVM per ttl, so
    // exactly one mint may happen no matter how many page readers race
    val mints = new java.util.concurrent.atomic.AtomicInteger(0)
    val p = new TokenProvider(mint = Some(() =>
      (s"t${mints.incrementAndGet()}", 60000L)))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
    try {
      val start = new java.util.concurrent.CountDownLatch(1)
      val tokens = (1 to 16).map { _ =>
        pool.submit(new java.util.concurrent.Callable[String] {
          override def call(): String = { start.await(); p.token }
        })
      }
      start.countDown()
      val got = tokens.map(_.get()).toSet
      assert(got === Set("t1"), s"all racers must see the one minted token, got $got")
      assert(mints.get() === 1)
      // a 401 invalidate under the same race re-mints exactly once more
      p.invalidate()
      val start2 = new java.util.concurrent.CountDownLatch(1)
      val tokens2 = (1 to 16).map { _ =>
        pool.submit(new java.util.concurrent.Callable[String] {
          override def call(): String = { start2.await(); p.token }
        })
      }
      start2.countDown()
      assert(tokens2.map(_.get()).toSet === Set("t2"))
      assert(mints.get() === 2)
    } finally pool.shutdown()
  }

  test("the loopback token route's guards: GET is 405, wrong grant 400") {
    // the fixture server's own negative branches — otherwise dead code
    // that could silently rot into accepting a malformed exchange
    LoopbackApi.withCredentialedApi("cid4", "s4") { api =>
      val t = new JdkHttpTransport()
      val basic = java.util.Base64.getEncoder
        .encodeToString("cid4:s4".getBytes("UTF-8"))
      assert(t.fetch(api.tokenUrl, Map("Authorization" -> s"Basic $basic"))
        .status === 405, "a GET at the token route must be refused")
      assert(t.post(api.tokenUrl, Map("Authorization" -> s"Basic $basic"),
        "grant_type=authorization_code").status === 400,
        "only client_credentials is served")
      assert(api.mintCount.get() === 0)
    }
  }

  test("a partial credential triple is refused at scan setup") {
    val e = intercept[Exception] {
      spark.read.format("graft.sources.paged.PagedSource")
        .option("url", "http://127.0.0.1:1/x")
        .option("clientId", "cid").load()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("must be set together")))
  }
}
