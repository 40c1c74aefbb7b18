package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Test.Parameters

import graft.sources.paged.{Clock, HttpTransport, TokenBucketTransport}

/** Property checks for the token bucket's pacing contract, pinned after
  * the round-13 acquire() rework (wait computed under the lock, slept
  * outside it, re-checked on wake). The contract the S3 operator exists
  * to enforce: for ANY (rate, burst, call count), N sequential calls
  * admit at most `burst` immediately and the rest at `rate`, so the
  * fake-clock elapsed time is bounded below by the ideal schedule —
  * restructuring the lock must never have opened an over-admission
  * path. All on a fake clock: thousands of cases in microseconds. */
object ThrottleProps extends Properties("Throttle") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(200)

  private final class FakeClock extends Clock {
    var now: Long = 0L
    override def nowMs: Long = now
    override def sleep(ms: Long): Unit = now += ms
  }

  private object NoopTransport extends HttpTransport {
    override def get(url: String, headers: Map[String, String]): (Int, String) =
      (200, "ok")
  }

  private val cases: Gen[(Double, Int, Int)] = for {
    // rates from one request every 10s up to 1000/s; bursts 1-16
    rate <- Gen.oneOf(0.1, 0.5, 1.0, 2.0, 3.0, 10.0, 100.0, 1000.0)
    burst <- Gen.chooseNum(1, 16)
    calls <- Gen.chooseNum(1, 60)
  } yield (rate, burst, calls)

  property("never over-admits: elapsed >= ideal schedule for the tail") =
    Prop.forAll(cases) { case (rate, burst, calls) =>
      val clock = new FakeClock
      val t = new TokenBucketTransport(NoopTransport, rate, burst, clock)
      (1 to calls).foreach(_ => t.get("u", Map.empty))
      // the first `burst` calls are free; each call beyond them needs a
      // fresh token minted at `rate`, so the clock must have advanced at
      // least (calls - burst)/rate seconds (exact arithmetic would hit
      // float rounding; allow 1ms slack per paced call from the ceil)
      val paced = math.max(0, calls - burst)
      val idealMs = (paced / rate * 1000.0).toLong
      clock.now >= idealMs - paced
    }

  property("no lost capacity: elapsed <= ideal + one token interval") =
    Prop.forAll(cases) { case (rate, burst, calls) =>
      // pacing must not overshoot either — a bucket that made callers
      // wait LONGER than the schedule would silently halve throughput.
      // Upper bound: ideal + one inter-token interval + 1ms/call ceil.
      val clock = new FakeClock
      val t = new TokenBucketTransport(NoopTransport, rate, burst, clock)
      (1 to calls).foreach(_ => t.get("u", Map.empty))
      val paced = math.max(0, calls - burst)
      val idealMs = (paced / rate * 1000.0).toLong
      clock.now <= idealMs + (1000.0 / rate).toLong + calls
    }

  property("post() shares the same budget as get/fetch — one bucket, all verbs") =
    Prop.forAll(cases) { case (rate, burst, calls) =>
      // the bucket's contract is requests-per-second, not GETs-per-
      // second: a mixed get/post/fetch stream must pace identically to
      // an all-get stream, or a POSTing client would dodge the throttle
      val postCapable = new HttpTransport {
        override def get(url: String, headers: Map[String, String]) = (200, "ok")
        override def post(url: String, headers: Map[String, String],
                          body: String) = graft.sources.paged.HttpReply(200, "ok")
      }
      val clock = new FakeClock
      val t = new TokenBucketTransport(postCapable, rate, burst, clock)
      (1 to calls).foreach(i =>
        if (i % 3 == 0) t.post("u", Map.empty, "b")
        else if (i % 3 == 1) { t.get("u", Map.empty); () }
        else { t.fetch("u", Map.empty); () })
      val paced = math.max(0, calls - burst)
      val idealMs = (paced / rate * 1000.0).toLong
      clock.now >= idealMs - paced
    }

  property("reconfigure mid-stream keeps the never-over-admit bound") =
    Prop.forAll(cases, cases) { case ((r1, b1, c1), (r2, b2, c2)) =>
      val clock = new FakeClock
      val t = new TokenBucketTransport(NoopTransport, r1, b1, clock)
      (1 to c1).foreach(_ => t.get("u", Map.empty))
      val switchAt = clock.now
      t.reconfigure(r2, b2)
      (1 to c2).foreach(_ => t.get("u", Map.empty))
      // after the switch: at most b2 tokens could have been available
      // (settle clamps to the new burst; no free burst minted), so the
      // post-switch stretch paces at least (c2 - b2) tokens at r2
      val paced = math.max(0, c2 - b2)
      val idealMs = (paced / r2 * 1000.0).toLong
      (clock.now - switchAt) >= idealMs - paced
    }
}
