package graft.sources.paged

/** Time seam for throttling/backoff code — specs substitute a fake clock
  * whose `sleep` advances `nowMs` instantly, so rate-limit behavior is
  * tested deterministically in microseconds of wall time. */
trait Clock {
  def nowMs: Long
  def sleep(ms: Long): Unit
}

/** Production clock. */
object SystemClock extends Clock {
  override def nowMs: Long = System.currentTimeMillis()
  override def sleep(ms: Long): Unit = if (ms > 0) Thread.sleep(ms)
}

/** S3: client-side rate limiter as a transport decorator — a token
  * bucket in front of any [[HttpTransport]].
  *
  * The reference throttles unconditionally: `time.sleep(0.5)` before
  * every call (`01_TestingPy/Spotify_API3.py:62-63`), i.e. ≤2 requests
  * per second — the default here. A token bucket generalizes that exact
  * contract: at `burst = 1` it degenerates to the reference's fixed
  * inter-request gap, while `burst > 1` lets a deployment absorb short
  * spikes without raising the sustained rate.
  *
  * Scale shape: this object lives per-executor (wrapped around the
  * per-partition transport), so `ratePerSec` is the PER-EXECUTOR rate;
  * a cluster-wide budget must be divided by the number of concurrent
  * partition readers when configuring it. State is a single (tokens,
  * timestamp) pair under the instance lock — request threads on one
  * executor serialize only for the refill arithmetic, not the I/O.
  */
class TokenBucketTransport(inner: HttpTransport, ratePerSec: Double = 2.0,
                           burst: Int = 1, clock: Clock = SystemClock)
    extends HttpTransport {
  require(ratePerSec > 0, "ratePerSec must be positive")
  require(burst >= 1, "burst must be at least 1")

  // pacing is mutable under the instance lock: the per-endpoint bucket
  // cache reconfigures ONE bucket in place when a scan arrives with new
  // options, so concurrent mixed-config scans of the same endpoint share
  // a single budget instead of summing independent ones
  private[this] var rate: Double = ratePerSec
  private[this] var cap: Int = burst
  private[this] var tokens: Double = burst.toDouble
  private[this] var last: Long = clock.nowMs
  // lock-free mirror of (rate, cap): `config` and the bucket cache's
  // same-config pre-check must not touch the monitor — a reader thread
  // building a client mustn't queue behind another thread's rate-limit
  // wait just to discover nothing needs changing
  @volatile private[this] var cfg: (Double, Int) = (ratePerSec, burst)

  /** The pacing currently in force — the no-create probe specs use to
    * prove a scan's DSv2 options reached this layer. Volatile read, no
    * lock: never blocks behind an in-progress acquire/reconfigure. */
  def config: (Double, Int) = cfg

  /** Re-point the bucket at a new pacing (no-op when unchanged). Tokens
    * already accrued settle at the OLD rate first, then clamp to the new
    * burst — switching rates never mints a free burst. A thread already
    * asleep in acquire() keeps the wait it computed at the old rate, so
    * after a switch to a FASTER rate it can oversleep by at most one old
    * inter-token interval (1/oldRate sec) before re-checking under the
    * lock; pacing is never violated, and the transient ends with that
    * one wake. Bounded and accepted — slicing the sleep to react sooner
    * isn't worth the extra wake-ups on the steady-state path. */
  def reconfigure(newRate: Double, newBurst: Int): Unit = synchronized {
    require(newRate > 0, s"ratePerSec must be positive, got $newRate")
    require(newBurst >= 1, s"burst must be at least 1, got $newBurst")
    if (newRate != rate || newBurst != cap) {
      refill()
      rate = newRate
      cap = newBurst
      tokens = math.min(tokens, cap.toDouble)
      cfg = (newRate, newBurst)
    }
  }

  private def refill(): Unit = {
    val now = clock.nowMs
    tokens = math.min(cap.toDouble, tokens + (now - last) / 1000.0 * rate)
    last = now
  }

  /** Block until a token is available, then spend it. The wait is
    * computed under the lock but slept OUTSIDE it — holding the monitor
    * across the sleep would block every concurrent acquire, config read,
    * and reconfigure for up to a full inter-token interval (~0.5s at the
    * default 2 req/s, longer at lower rates). After waking, re-check
    * under the lock: another thread may have taken the refilled token
    * first, in which case loop and wait again (pacing stays enforced —
    * each successful exit spends exactly one whole token). */
  private def acquire(): Unit = {
    var acquired = false
    while (!acquired) {
      val waitMs = synchronized {
        refill()
        if (tokens >= 1.0) { tokens -= 1.0; acquired = true; 0L }
        else math.ceil((1.0 - tokens) / rate * 1000.0).toLong
      }
      if (!acquired) clock.sleep(waitMs)
    }
  }

  override def get(url: String, headers: Map[String, String]): (Int, String) = {
    acquire()
    inner.get(url, headers)
  }

  override def fetch(url: String, headers: Map[String, String]): HttpReply = {
    acquire()
    inner.fetch(url, headers)
  }

  // a POST through a throttled transport is paced like any request —
  // the bucket's contract is requests-per-second, not GETs-per-second
  override def post(url: String, headers: Map[String, String],
                    body: String): HttpReply = {
    acquire()
    inner.post(url, headers, body)
  }
}
