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
    * scripted reply. */
  private final class CannedPost(status: Int, body: String)
      extends HttpTransport {
    var posted: Option[(String, Map[String, String], String)] = None
    override def get(url: String, headers: Map[String, String]) =
      throw new IllegalStateException("mint must POST, not GET")
    override def post(url: String, headers: Map[String, String],
                      body0: String): HttpReply = {
      posted = Some((url, headers, body0))
      HttpReply(status, body)
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
