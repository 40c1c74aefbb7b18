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
}
