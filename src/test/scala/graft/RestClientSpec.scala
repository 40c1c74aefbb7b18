package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.paged._

/** RestPageClient over a canned HttpTransport: URL construction, JSON
  * envelope parsing, status→retry-semantics mapping, and composition
  * with RetryingClient's re-auth loop. No network anywhere — the
  * transport trait is the deployment seam (see README). */
class RestClientSpec extends AnyFunSuite {

  /** Canned transport: records requests, replays scripted (status, body)
    * responses in order (last one repeats). */
  private class Canned(responses: (Int, String)*) extends HttpTransport {
    var requests: List[(String, Map[String, String])] = Nil
    private var i = 0
    override def get(url: String, headers: Map[String, String]): (Int, String) = {
      requests ::= (url, headers)
      val r = responses(math.min(i, responses.length - 1)); i += 1; r
    }
  }

  /** Canned transport with full replies (headers included) for the
    * Retry-After paths. */
  private class CannedFull(replies: HttpReply*) extends HttpTransport {
    var requests: List[String] = Nil
    private var i = 0
    private def next(url: String): HttpReply = {
      requests ::= url
      val r = replies(math.min(i, replies.length - 1)); i += 1; r
    }
    override def get(url: String, headers: Map[String, String]): (Int, String) = {
      val r = next(url); (r.status, r.body)
    }
    override def fetch(url: String, headers: Map[String, String]): HttpReply =
      next(url)
  }

  /** Deterministic clock: `sleep` advances time instantly and records
    * the requested pause. */
  private class FakeClock(start: Long = 0L) extends Clock {
    var now: Long = start
    var sleeps: List[Long] = Nil // head = most recent
    override def nowMs: Long = now
    override def sleep(ms: Long): Unit = { sleeps ::= ms; now += ms }
  }

  private def envelope(total: Int, items: String*): String =
    s"""{"total": $total, "items": [${items.mkString(",")}]}"""

  test("fetchPage builds the paged URL and projects fields in order") {
    val t = new Canned((200, envelope(42,
      """{"id":"a1","name":"x","popularity":"7","market":"ID"}""",
      """{"id":"a2","name":"y","market":"US"}""")))
    val c = new RestPageClient(t, "https://api.example.com/artists",
                               new TokenProvider)
    val rows = c.fetchPage(20, 10, Some("ID"), Array("name", "id", "popularity"))
    assert(rows.map(_.toSeq) === Seq(Seq("x", "a1", "7"), Seq("y", "a2", null)))
    val (url, headers) = t.requests.head
    assert(url === "https://api.example.com/artists?offset=20&limit=10&market=ID&fields=name%2Cid%2Cpopularity")
    assert(headers("Authorization").startsWith("Bearer "))
  }

  test("total asks for the cheapest page and reads the envelope total") {
    val t = new Canned((200, envelope(1234)))
    val c = new RestPageClient(t, "https://api.example.com/artists",
                               new TokenProvider)
    assert(c.total(Some("US")) === 1234L)
    assert(t.requests.head._1 ===
      "https://api.example.com/artists?offset=0&limit=1&market=US")
  }

  test("fetchByIds joins ids with commas (the S5 multi-get URL shape)") {
    val t = new Canned((200, envelope(2,
      """{"id":"a1","name":"x"}""", """{"id":"a2","name":"y"}""")))
    val c = new RestPageClient(t, "https://api.example.com/artists",
                               new TokenProvider)
    val rows = c.fetchByIds(Seq("a1", "a2"), Array("id", "name"))
    assert(rows.map(_.toSeq) === Seq(Seq("a1", "x"), Seq("a2", "y")))
    assert(t.requests.head._1 ===
      "https://api.example.com/artists?ids=a1%2Ca2&fields=id%2Cname")
  }

  test("status mapping drives RetryingClient: 401 re-auths, 503 retries, then succeeds") {
    val t = new Canned(
      (401, ""), (503, "oops"),
      (200, envelope(1, """{"id":"a1","name":"x"}""")))
    // deterministic mint counter (the stock provider's tokens are
    // time-stamped — a same-millisecond re-mint would compare equal)
    val auth = new TokenProvider {
      var mints = 0
      private var valid = false
      override def token: String = synchronized {
        if (!valid) { mints += 1; valid = true }; s"tok-$mints"
      }
      override def invalidate(): Unit = synchronized { valid = false }
    }
    val c = new RetryingClient(
      new RestPageClient(t, "https://api.example.com/artists", auth),
      maxRetries = 3, auth = auth)
    val rows = c.fetchPage(0, 10, None, Array("id"))
    assert(rows.map(_.toSeq) === Seq(Seq("a1")))
    assert(t.requests.length === 3)
    // the 401 invalidated the cached token; the replay minted a new one
    assert(auth.mints === 2)
    assert(t.requests.head._2("Authorization") === "Bearer tok-2")
  }

  test("404 fails fast — not a retryable condition") {
    val t = new Canned((404, "no such endpoint"))
    val c = new RestPageClient(t, "https://api.example.com/nope",
                               new TokenProvider)
    intercept[IllegalStateException] { c.total() }
    assert(t.requests.length === 1)
  }

  test("malformed envelope fails fast through RetryingClient (deterministic, no replay)") {
    // A response missing `total` is a CONTRACT break, not a transient
    // fault: replaying it maxRetries times yields the same bytes. It
    // must surface as IllegalStateException (which RetryingClient does
    // not catch) after exactly one request.
    val t = new Canned((200, """{"items": []}"""))
    val c = new RetryingClient(
      new RestPageClient(t, "https://api.example.com/a", new TokenProvider),
      maxRetries = 3)
    intercept[IllegalStateException] { c.total() }
    assert(t.requests.length === 1)
  }

  test("429 is retried only after honoring the server's Retry-After") {
    val t = new CannedFull(
      HttpReply(429, "", Map("retry-after" -> "3")),
      HttpReply(200, envelope(1, """{"id":"a1"}""")))
    var sleeps = List.empty[Long]
    val c = new RetryingClient(
      new RestPageClient(t, "https://api.example.com/a", new TokenProvider),
      maxRetries = 3, sleeper = ms => sleeps ::= ms)
    val rows = c.fetchPage(0, 10, None, Array("id"))
    assert(rows.map(_.toSeq) === Seq(Seq("a1")))
    assert(sleeps === List(3000L), "must pause the advertised 3s before replay")
    assert(t.requests.length === 2)
  }

  test("429 without Retry-After backs off exponentially from 500ms") {
    val t = new CannedFull(
      HttpReply(429, ""), HttpReply(429, ""),
      HttpReply(200, envelope(1, """{"id":"a1"}""")))
    var sleeps = List.empty[Long]
    val c = new RetryingClient(
      new RestPageClient(t, "https://api.example.com/a", new TokenProvider),
      maxRetries = 3, sleeper = ms => sleeps ::= ms)
    val rows = c.fetchPage(0, 10, None, Array("id"))
    assert(rows.map(_.toSeq) === Seq(Seq("a1")))
    assert(sleeps.reverse === List(500L, 1000L))
  }

  test("S3 token bucket: burst, then paced at ratePerSec, refilling while idle") {
    val inner = new Canned((200, "ok"))
    val clock = new FakeClock
    val t = new TokenBucketTransport(inner, ratePerSec = 2.0, burst = 2,
                                     clock = clock)
    t.get("u", Map.empty); t.get("u", Map.empty) // burst passes untouched
    assert(clock.sleeps.isEmpty)
    t.get("u", Map.empty) // bucket empty: wait one token period (500ms @2/s)
    assert(clock.sleeps === List(500L))
    t.get("u", Map.empty)
    assert(clock.sleeps === List(500L, 500L))
    clock.now += 10000 // long idle refills to the burst CAP, not 20 tokens
    t.get("u", Map.empty); t.get("u", Map.empty)
    assert(clock.sleeps.length === 2, "refilled burst passes untouched")
    t.get("u", Map.empty)
    assert(clock.sleeps === List(500L, 500L, 500L))
    assert(inner.requests.length === 7, "throttle delays, never drops")
  }

  test("S3 defaults reproduce the reference contract: <=2 req/s, no burst") {
    // Spotify_API3.py:62-63 sleeps 0.5s before every call; the default
    // bucket (2/s, burst 1) yields the same inter-request gap.
    val clock = new FakeClock
    val t = new TokenBucketTransport(new Canned((200, "ok")), clock = clock)
    t.get("u", Map.empty)
    assert(clock.sleeps.isEmpty, "first call of a fresh bucket is free")
    t.get("u", Map.empty); t.get("u", Map.empty)
    assert(clock.sleeps === List(500L, 500L))
  }

  test("S3 rate-limit waits happen OUTSIDE the bucket monitor") {
    // a thread sleeping for its token must not hold the instance lock:
    // config reads, reconfigure, and sibling acquires would otherwise
    // queue behind it for up to a full inter-token interval (ADVICE
    // round 12). The clock seam observes lock state at the exact moment
    // acquire() sleeps — deterministic, no racing threads needed.
    var bucket: TokenBucketTransport = null
    var heldDuringSleep = List.empty[Boolean]
    val clock = new Clock {
      var now = 0L
      override def nowMs: Long = now
      override def sleep(ms: Long): Unit = {
        heldDuringSleep ::= Thread.holdsLock(bucket)
        now += ms
      }
    }
    bucket = new TokenBucketTransport(new Canned((200, "ok")),
      ratePerSec = 2.0, burst = 1, clock = clock)
    bucket.get("u", Map.empty); bucket.get("u", Map.empty) // second waits
    assert(heldDuringSleep.nonEmpty, "the paced call must have slept")
    assert(heldDuringSleep.forall(_ == false),
      "acquire() must release the monitor before sleeping")
    // and config is served by a volatile read — callable mid-anything
    assert(bucket.config === ((2.0, 1)))
  }
}
