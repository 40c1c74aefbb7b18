package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.paged.{HttpTransport, TokenBucketTransport}

/** Round-14 pin for the throttle's aggregate pacing under REAL
  * concurrency — ThrottleProps drives the same contract hundreds of
  * times but single-threaded on a fake clock; this spec is the one
  * place N real threads race acquire()'s sleep-outside-lock loop on
  * the system clock. The bug class it guards: a woken sleeper and a
  * fresh caller both observing a refilled token and double-spending
  * it, which would admit measurably faster than burst + rate*elapsed.
  *
  * Flake-proofing (documented per the round-14 list):
  *  - the assertion is a LOWER bound on elapsed wall time
  *    (equivalently: admissions <= burst + rate*elapsed). Scheduler
  *    delay, GC pauses, a slow host all push elapsed UP, toward
  *    passing — nothing the host does can make a correct bucket finish
  *    ahead of the token schedule, so the test cannot flake on a busy
  *    machine.
  *  - the slack (10ms + 10% of ideal) covers the two clock seams: the
  *    bucket refills on currentTimeMillis (1ms granularity, wall
  *    clock) while the spec measures nanoTime (monotonic). A genuine
  *    double-spend at these parameters would land near HALF the ideal
  *    elapsed — an order of magnitude outside the slack. One seam the
  *    slack does NOT cover: a FORWARD wall-clock step (NTP slew/jump)
  *    larger than ~54ms landing inside the ~0.44s run would mint
  *    tokens early against the monotonic measurement and fail the
  *    lower bound spuriously. Accepted residual risk rather than
  *    injecting a monotonic Clock seam into production code for a
  *    test-only concern: steps that large mid-run are rare, the
  *    failure mode is loud (not a silent pass), and a failure that
  *    vanishes on re-run during a known clock adjustment reads as
  *    exactly what it is.
  *  - joins carry a 30s timeout so a deadlocked bucket fails the suite
  *    instead of hanging it. Nominal runtime ~0.5s.
  */
class ThrottleConcurrencySpec extends AnyFunSuite {

  test("N real threads never over-admit: admissions <= burst + rate*elapsed") {
    val rate = 400.0 // tokens/sec — high, so 180 admissions need only ~0.44s
    val burst = 4
    val threads = 6
    val callsPerThread = 30
    val totalCalls = threads * callsPerThread
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val inner = new HttpTransport {
      override def get(url: String, headers: Map[String, String]): (Int, String) = {
        calls.incrementAndGet(); (200, "ok")
      }
    }
    val bucket = new TokenBucketTransport(inner, rate, burst)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val t0 = System.nanoTime()
    val workers = (1 to threads).map { _ =>
      val th = new Thread(() =>
        try (1 to callsPerThread).foreach(_ => bucket.get("u", Map.empty))
        catch { case e: Throwable => failures.add(e) })
      th.start(); th
    }
    workers.foreach(_.join(30000L))
    assert(workers.forall(!_.isAlive),
      "worker still running after 30s: deadlock or gross over-throttle")
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    assert(failures.isEmpty, s"worker threw: ${failures.peek()}")
    assert(calls.get() === totalCalls)
    // The pacing contract in both equivalent readings (admission count is
    // fixed by construction, so the cap on admissions becomes a floor on
    // elapsed): tokens minted by time T never exceed burst + T*rate, and
    // each successful acquire spends exactly one whole token.
    val idealSec = (totalCalls - burst) / rate
    val slackSec = 0.010 + 0.1 * idealSec
    assert(elapsedSec >= idealSec - slackSec,
      s"$totalCalls admissions in ${elapsedSec}s — over-admission " +
        s"(schedule needs >= ${idealSec}s)")
    assert(totalCalls <= burst + rate * (elapsedSec + slackSec))
  }
}
