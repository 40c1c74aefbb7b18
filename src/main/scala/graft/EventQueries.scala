package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.Relational._
import graft.Tables.events

/** Event-time analytics over the `events` table — the batch twins of the
  * Structured Streaming operators in `graft.streaming` (same bucketing
  * semantics, so a streaming job's output can be verified against these).
  *
  * All event-time math happens on `ts_us` (integer microseconds since
  * epoch) — never float seconds — so buckets, gaps, and sessions are exact
  * and identical to the DuckDB oracle (`epoch_us`). At scale, groupBy on
  * (bucket, type) is a partial-aggregated shuffle whose width is bounded by
  * bucket-count x type-count, not event count.
  */
object EventQueries {

  def defs: Seq[QueryDef] = Seq(

    // ---- Tumbling 10-minute windows (streaming window() twin) -----------
    QueryDef("q30_event_tumbling",
      (s, dir) => events(s, dir)
        .groupBy(expr("(ts_us div 600000000) * 600").as("bucket_start"),
                 col("event_type"))
        .agg(count(lit(1)).as("n"),
             decSum(col("value")).as("total_value"))
        .orderBy("bucket_start", "event_type"),
      Some("""
        SELECT (epoch_us(ts) // 600000000) * 600 AS bucket_start, event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events GROUP BY bucket_start, event_type
        ORDER BY bucket_start, event_type""")),

    // ---- Sessionization: 30-min inactivity gap (gaps-and-islands) -------
    QueryDef("q31_sessionize",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts_us")
        events(s, dir)
          .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
          .withColumn("new_s",
            when(col("prev_us").isNull ||
                 col("ts_us") - col("prev_us") > 1800000000L, 1L).otherwise(0L))
          .groupBy("user_id")
          .agg(sum(col("new_s")).as("n_sessions"), count(lit(1)).as("n_events"))
          .orderBy("user_id")
      },
      Some("""
        SELECT user_id, CAST(SUM(new_s) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
        FROM (SELECT user_id,
                     CASE WHEN LAG(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
                            OR t - LAG(t) OVER (PARTITION BY user_id ORDER BY t) > 1800000000
                          THEN 1 ELSE 0 END AS new_s
              FROM (SELECT user_id, epoch_us(ts) AS t FROM events))
        GROUP BY user_id ORDER BY user_id""")),

    // ---- Conditional pivot: per-user event-type profile ------------------
    QueryDef("q32_pivot_profile",
      (s, dir) => {
        val e = events(s, dir)
        def cnt(t: String) = sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$t")
        e.groupBy("user_id")
          .agg(cnt("click"), cnt("view"), cnt("purchase"), cnt("signup"), cnt("error"),
               sum(when(col("event_type") === "purchase",
                        col("value").cast(DecimalType(18, 2)))
                   .otherwise(lit(0).cast(DecimalType(18, 2))))
                 .cast("double").as("purchase_value"))
          .orderBy("user_id")
      },
      Some("""
        SELECT user_id,
               CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
               CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
               CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
               CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN CAST(value AS DECIMAL(18,2))
                             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase_value
        FROM events GROUP BY user_id ORDER BY user_id""")),

    // ---- Semi-structured extraction from the JSON props column (X6) ------
    QueryDef("q33_json_extract",
      // try_cast, not cast: regexp_extract yields '' on no-match and ANSI
      // CAST('' AS LONG) throws — props without "k" must yield null.
      (s, dir) => events(s, dir)
        .select(col("event_id"),
                expr("""try_cast(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)""")
                  .as("k"))
        .orderBy("event_id"),
      Some("""
        SELECT event_id,
               TRY_CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k
        FROM events ORDER BY event_id""")),

    // ---- As-of join (attribution): latest click at-or-before each
    //      purchase, per user. The classic time-series operator Spark has
    //      no primitive for — expressed as a single-pass running
    //      last-non-null over the unioned event stream: one shuffle on
    //      user_id, no self-join, no range explosion. At 100 TB this beats
    //      any join formulation (the state per user is one value). --------
    QueryDef("q35_asof_attribution",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        events(s, dir)
          .withColumn("click_us",
            last(when(col("event_type") === "click", col("ts_us")),
                 ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"),
                  col("ts_us").as("purchase_us"), col("click_us"),
                  (col("ts_us") - col("click_us")).as("gap_us"))
          .orderBy("event_id")
      },
      Some("""
        SELECT event_id, user_id, purchase_us, click_us,
               purchase_us - click_us AS gap_us
        FROM (SELECT event_id, user_id, event_type, epoch_us(ts) AS purchase_us,
                     LAST_VALUE(CASE WHEN event_type = 'click' THEN epoch_us(ts) END
                                IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS click_us
              FROM events)
        WHERE event_type = 'purchase'
        ORDER BY event_id""")),

    // ---- Sliding windows via explode (streaming sliding-window twin):
    //      each event contributes to 3 overlapping 15-min windows ----------
    QueryDef("q34_sliding_window",
      (s, dir) => events(s, dir)
        .withColumn("w_off", explode(array(lit(0L), lit(1L), lit(2L))))
        .withColumn("bucket_start",
          (expr("ts_us div 300000000") - col("w_off")) * 300)
        .filter(col("bucket_start") >= 0)
        .groupBy("bucket_start")
        .agg(count(lit(1)).as("n"), decSum(col("value")).as("total_value"))
        .orderBy("bucket_start"),
      Some("""
        SELECT ((epoch_us(ts) // 300000000) - w_off) * 300 AS bucket_start,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events, (SELECT UNNEST([0, 1, 2]) AS w_off)
        WHERE ((epoch_us(ts) // 300000000) - w_off) * 300 >= 0
        GROUP BY bucket_start ORDER BY bucket_start""")))
}
