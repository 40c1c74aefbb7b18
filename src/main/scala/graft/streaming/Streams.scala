package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.types._

/** Structured Streaming operators over the event schema — the streaming
  * twins of the batch queries in [[graft.EventQueries]] (q30/q31/q34 use
  * the same epoch-aligned bucketing, so a streaming job's output can be
  * diffed against the batch result on the same data).
  *
  * The reference pipeline is batch-only (SURVEY.md §2.9: no streams in
  * reynaldyAl/BigData06); this module is the north-star streaming
  * extension. Design choices, stated because the reference has none to
  * copy:
  *
  *   - **Event time, not arrival time.** Every aggregation keys on the
  *     `ts` column with an explicit watermark; late events beyond the
  *     watermark are dropped (counted nowhere), the standard documented
  *     Spark semantic.
  *   - **Epoch-aligned windows.** `window()`/`session_window()` align to
  *     the Unix epoch, identical to the batch `ts_us div N` bucketing.
  *   - **State is bounded.** Watermarks bound window state; the custom
  *     sessionizer uses event-time timeout so state for an idle key is
  *     freed once the watermark passes its gap. At 1000 executors state
  *     is per-key-partitioned by the shuffle on `user_id` — no broadcast,
  *     no driver state.
  */
object Streams {

  /** The event schema as streamed (ts is a proper timestamp; the batch
    * testdata's TIMESTAMP(NANOS) quirk is a parquet-file artifact handled
    * in [[graft.Tables.events]]). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-based streaming source: picks up parquet files as they land in
    * `dir`. `maxFilesPerTrigger` bounds per-batch work (backpressure). */
  def eventFileStream(spark: SparkSession, dir: String,
                      maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Tumbling event-time windows per event type: count + value sum.
    * Epoch-aligned like the batch q30 (`ts_us div 600e6`). */
  def tumbling(events: DataFrame, window: String = "10 minutes",
               watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window)
                 .as("w"),
               col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(unix_timestamp(col("w.start")).as("bucket_start"),
              col("event_type"), col("n"), col("total_value"))

  /** Sliding windows (q34's explode-twin, expressed natively): every event
    * lands in window/slide overlapping buckets. */
  def sliding(events: DataFrame, window: String = "15 minutes",
              slide: String = "5 minutes",
              watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window, slide).as("w"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(unix_timestamp(col("w.start")).as("bucket_start"),
              col("n"), col("total_value"))

  /** Session windows per user via the built-in session_window (gap-merged
    * by the engine; the declarative path — prefer this over custom state
    * when plain per-session aggregates suffice). */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes",
                 watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("user_id"),
              unix_timestamp(col("w.start")).as("session_start"),
              unix_timestamp(col("w.end")).as("session_end"),
              col("n_events"), col("total_value"))

  /** Streaming exact dedup by event id. `dropDuplicatesWithinWatermark`
    * keeps dedup state only inside the watermark horizon — the streaming
    * twin of batch d50, with BOUNDED state on an unbounded stream (plain
    * `dropDuplicates` on a stream retains every key forever; at-least-once
    * sources re-deliver within minutes, not days, so a watermark-scoped
    * guarantee is the operationally correct one). */
  def dedupStream(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join — the streaming twin of batch q37: pair
    * each event with same-user events in the next `windowSec` seconds.
    * Both sides are watermarked and the join condition bounds the
    * event-time range, so each side's buffered state expires as the
    * watermark advances (unbounded-state stream joins don't run at scale).
    * Gap reported in exact integer microseconds, like every event-time
    * computation in this engine. */
  def streamRangeJoin(left: DataFrame, right: DataFrame,
                      windowSec: Int = 60,
                      watermark: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col("event_id").as("a_id"), col("user_id"), col("ts").as("a_ts"))
    val r = right.withWatermark("ts", watermark)
      .select(col("event_id").as("b_id"), col("user_id").as("b_user"), col("ts").as("b_ts"))
    l.join(r,
        col("user_id") === col("b_user") &&
        col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr(s"INTERVAL $windowSec SECONDS"))
      .select(col("a_id"), col("b_id"), col("user_id"),
              (unix_micros(col("b_ts")) - unix_micros(col("a_ts"))).as("gap_us"))
  }

  // ---- Custom state: explicit sessionizer --------------------------------

  /** Input row for the stateful sessionizer. */
  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)

  /** Open-session state kept per user between micro-batches. */
  case class SessionState(start: Long, last: Long, nEvents: Long, total: Double)

  /** A closed session, emitted once the watermark passes last+gap. */
  case class ClosedSession(user_id: Long, session_start: Long,
                           session_end: Long, n_events: Long, total_value: Double)

  /** Sessionize with `flatMapGroupsWithState` — the custom-state path for
    * semantics session_window can't express (here: emit exactly one row
    * per CLOSED session, never partials; extendable to per-session
    * sequences, funnels, abandoned-cart logic...).
    *
    * Gap semantics match batch q31: events more than `gap` apart (strict)
    * are different sessions, in integer microseconds. Correct under
    * OUT-OF-ORDER arrival up to the watermark: state is the LIST of open
    * sessions per user, a new event extends any session it lands within
    * `gap` of (merging sessions it bridges) or opens its own, and a
    * session is emitted only once the watermark passes its close time —
    * never inline, because an in-horizon straggler could still extend it.
    * State per key is O(open sessions), bounded by horizon/gap.
    */
  def sessionize(events: Dataset[Event], gapUs: Long = 1800000000L)
                (implicit spark: SparkSession): Dataset[ClosedSession] = {
    import spark.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Seq[SessionState], ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[Seq[SessionState]]) =>
          def us(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000) % 1000
          val wmMs = state.getCurrentWatermarkMs()

          // 1. fold the batch's events into the open-session set
          var open = state.getOption.getOrElse(Nil).toList
          if (!state.hasTimedOut) {
            rows.toSeq.sortBy(e => us(e.ts)).foreach { e =>
              val t = us(e.ts)
              val (touching, rest) = open.partition(s =>
                t >= s.start - gapUs && t <= s.last + gapUs)
              val merged = touching.foldLeft(SessionState(t, t, 1L, e.value)) {
                (acc, s) => SessionState(math.min(acc.start, s.start),
                  math.max(acc.last, s.last), acc.nEvents + s.nEvents,
                  acc.total + s.total)
              }
              open = merged :: rest
            }
          }

          // 2. emit every session the watermark has sealed (no in-horizon
          //    event can reach it anymore)
          val (closed, stillOpen) = open.partition(s =>
            (s.last + gapUs) / 1000L < wmMs)
          val out = closed.sortBy(_.start).map(s => ClosedSession(userId,
            s.start / 1000000L, s.last / 1000000L, s.nEvents, s.total))

          // 3. keep the rest; wake when the earliest could seal
          if (stillOpen.isEmpty) state.remove()
          else {
            state.update(stillOpen)
            state.setTimeoutTimestamp(math.max(wmMs + 1,
              stillOpen.map(s => (s.last + gapUs) / 1000L + 1).min))
          }
          out.iterator
      }
  }

  // ---- Sinks --------------------------------------------------------------

  /** Partitioned-parquet streaming sink (S6's production form): exactly-once
    * per micro-batch via the checkpoint, partitioned by event date so a
    * 100 TB-scale consumer prunes by day. `eventDate` derives the partition
    * column from whatever time column the upstream operator emits
    * (default: the tumbling/sliding `bucket_start` unix seconds; pass e.g.
    * `to_date(timestamp_seconds(col("session_start")))` for sessions or
    * `to_date(col("ts"))` for row-level streams). */
  def toPartitionedParquet(df: DataFrame, path: String, checkpoint: String,
                           eventDate: org.apache.spark.sql.Column =
                             to_date(timestamp_seconds(col("bucket_start")))): StreamingQuery =
    df.withColumn("event_date", eventDate)
      .writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("event_date")
      .outputMode(OutputMode.Append())
      .start()
}
