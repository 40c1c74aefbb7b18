package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Streams
import graft.streaming.Streams.{ClosedSession, Event}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int, sec: Int = 0): Timestamp =
    new Timestamp(min * 60000L + sec * 1000L) // minutes after epoch

  private def drain(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    q.processAllAvailable()
  }

  test("tumbling windows aggregate per 10-minute epoch-aligned bucket") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streams.tumbling(in.toDF(), "10 minutes", "30 minutes")
      .writeStream.format("memory").queryName("tumb")
      .outputMode("update").start()
    try {
      in.addData(
        Event(1, ts(1), 10, "click", 1.0),
        Event(2, ts(9), 10, "click", 2.0),
        Event(3, ts(12), 11, "view", 5.0))
      drain(q)
      val rows = spark.table("tumb")
        .select("bucket_start", "event_type", "n", "total_value")
        .as[(Long, String, Long, Double)].collect().toSet
      assert(rows === Set((0L, "click", 2L, 3.0), (600L, "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("tumbling drops events later than the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    // Append mode: a window is only emitted once the watermark passes its
    // end, and late data beyond the watermark is discarded.
    val q = Streams.tumbling(in.toDF(), "10 minutes", "10 minutes")
      .writeStream.format("memory").queryName("tumb_late")
      .outputMode("append").start()
    try {
      in.addData(Event(1, ts(5), 10, "click", 1.0))
      drain(q)
      // advance watermark far past the first window: max(ts)=100min => wm=90min
      in.addData(Event(2, ts(100), 10, "view", 1.0))
      drain(q)
      // this event's window [0,10) is closed; must be dropped silently
      in.addData(Event(3, ts(6), 10, "click", 99.0))
      drain(q)
      val rows = spark.table("tumb_late")
        .select("bucket_start", "event_type", "n", "total_value")
        .as[(Long, String, Long, Double)].collect().toSet
      assert(rows === Set((0L * 600, "click", 1L, 1.0)))
    } finally q.stop()
  }

  test("streaming tumbling matches the batch q30 bucketing on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      Event(1, ts(1), 1, "click", 10.0), Event(2, ts(4), 2, "view", 20.0),
      Event(3, ts(11), 1, "click", 30.0), Event(4, ts(25), 3, "purchase", 40.0),
      Event(5, ts(27), 1, "view", 50.0))
    val in = MemoryStream[Event]
    val q = Streams.tumbling(in.toDF(), "10 minutes", "30 minutes")
      .writeStream.format("memory").queryName("tumb_eq")
      .outputMode("update").start()
    try {
      in.addData(events: _*)
      drain(q)
      val streamed = spark.table("tumb_eq")
        .select("bucket_start", "event_type", "n", "total_value")
        .as[(Long, String, Long, Double)].collect().toSet
      val batch = events.toDF()
        .withColumn("ts_us", unix_micros(col("ts")))
        .groupBy(expr("(ts_us div 600000000) * 600").as("bucket_start"),
                 col("event_type"))
        .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
        .as[(Long, String, Long, Double)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("session_window merges events within the gap per user") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    // session_window aggregation only supports append mode: a session row
    // is emitted once the watermark passes its end (start + gap).
    val q = Streams.sessionAgg(in.toDF(), "30 minutes", "1 hour")
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      in.addData(
        Event(1, ts(10), 1, "click", 1.0),
        Event(2, ts(20), 1, "view", 2.0))  // same session (10 < 30 gap)
      drain(q)
      in.addData(Event(3, ts(120), 1, "click", 4.0)) // new session
      drain(q)
      // watermark only advances at the NEXT batch: land one more event.
      // After it, wm = 240min - 60min = 180min (10800s), past both session
      // ends (3000s and 7200s+1800s=9000s) => both emitted.
      in.addData(Event(4, ts(240), 2, "click", 8.0))
      drain(q)
      val rows = spark.table("sess")
        .select("user_id", "session_start", "session_end", "n_events", "total_value")
        .as[(Long, Long, Long, Long, Double)].collect().toSet
      assert(rows === Set((1L, 600L, 3000L, 2L, 3.0),
                          (1L, 7200L, 9000L, 1L, 4.0)))
    } finally q.stop()
  }

  test("stateful sessionizer emits one row per closed session, only once sealed") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val in = MemoryStream[Event]
    val q = Streams.sessionize(in.toDS())
      .writeStream.format("memory").queryName("sessionize")
      .outputMode("append").start()
    try {
      // user 1: two sessions in one batch (gap 30min exceeded). Times stay
      // clear of epoch 0 — an event at ts <= the initial watermark (0)
      // would be dropped as late, by design.
      in.addData(
        Event(1, ts(10), 1, "click", 1.0),
        Event(2, ts(15), 1, "view", 2.0),
        Event(3, ts(100), 1, "click", 4.0))
      drain(q)
      // NOTHING emits yet: the watermark (100min - 1h horizon = 40min)
      // hasn't passed either session's close time — an out-of-order
      // straggler could still extend them, so inline emission would be
      // wrong. (Session 1 seals at 15+30=45min.)
      assert(spark.table("sessionize").as[ClosedSession].collect().isEmpty)
      // push the watermark far ahead => both sessions seal and emit
      in.addData(Event(9, ts(600), 2, "click", 0.5))
      drain(q)
      in.addData(Event(10, ts(610), 2, "view", 0.5))
      drain(q)
      val after = spark.table("sessionize")
        .as[ClosedSession].collect().toSet
      assert(after === Set(
        ClosedSession(1L, 600L, 900L, 2L, 3.0),
        ClosedSession(1L, 6000L, 6000L, 1L, 4.0)))
    } finally q.stop()
  }

  test("sessionizer handles cross-batch out-of-order events like the batch query") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val in = MemoryStream[Event]
    val q = Streams.sessionize(in.toDS())
      .writeStream.format("memory").queryName("sess_ooo")
      .outputMode("append").start()
    try {
      in.addData(Event(1, ts(100), 1, "click", 1.0))
      drain(q) // watermark now 100min - 60min = 40min
      // out-of-order but inside the horizon: 50min > 40min watermark.
      // 50 and 100 are 50min apart (> 30min gap) => TWO sessions, exactly
      // what batch q31 computes on {50,100}.
      in.addData(Event(2, ts(50), 1, "view", 2.0))
      drain(q)
      // seal everything
      in.addData(Event(8, ts(600), 2, "click", 0.0))
      drain(q)
      in.addData(Event(9, ts(610), 2, "view", 0.0))
      drain(q)
      val sessions = spark.table("sess_ooo").as[ClosedSession]
        .filter(_.user_id == 1L).collect().toSet
      assert(sessions === Set(
        ClosedSession(1L, 3000L, 3000L, 1L, 2.0),
        ClosedSession(1L, 6000L, 6000L, 1L, 1.0)))
    } finally q.stop()
  }

  test("sessionizer gap semantics match batch q31 counts") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    // deterministic scattered events for 3 users
    val events = for {
      u <- 1 to 3; i <- 0 until 12
    } yield Event(u * 100 + i, ts(i * u * 11 + 1), u, "click", 1.0)
    val in = MemoryStream[Event]
    val q = Streams.sessionize(in.toDS())
      .writeStream.format("memory").queryName("sess_eq")
      .outputMode("append").start()
    try {
      in.addData(events: _*)
      drain(q)
      // close everything by pushing the watermark far ahead
      in.addData(Event(999, ts(100000), 99, "click", 0.0))
      drain(q)
      in.addData(Event(998, ts(100001), 98, "click", 0.0))
      drain(q)
      val streamed = spark.table("sess_eq").as[ClosedSession]
        .filter($"user_id" <= 3)
        .groupBy("user_id").agg(count(lit(1)).as("n_sessions"),
                                sum("n_events").as("n_events"))
        .as[(Long, Long, Long)].collect().toSet
      val batch = {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts_us")
        events.toDF()
          .withColumn("ts_us", unix_micros(col("ts")))
          .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
          .withColumn("new_s",
            when(col("prev_us").isNull ||
                 col("ts_us") - col("prev_us") > 1800000000L, 1L).otherwise(0L))
          .groupBy("user_id")
          .agg(sum(col("new_s")).as("n_sessions"), count(lit(1)).as("n_events"))
          .as[(Long, Long, Long)].collect().toSet
      }
      assert(streamed === batch)
    } finally q.stop()
  }

  test("dedupStream drops re-deliveries of the same event_id within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streams.dedupStream(in.toDF(), "30 minutes")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      in.addData(
        Event(1, ts(10), 1, "click", 1.0),
        Event(2, ts(11), 2, "view", 2.0),
        Event(1, ts(10), 1, "click", 1.0)) // same-batch duplicate
      drain(q)
      in.addData(Event(1, ts(12), 1, "click", 1.0)) // re-delivery, in horizon
      drain(q)
      val ids = spark.table("dedup_stream").select("event_id").as[Long].collect().toSeq
      assert(ids.sorted === Seq(1L, 2L))
    } finally q.stop()
  }

  test("streamRangeJoin pairs same-user events within the window, matching batch q37 semantics") {
    implicit val sqlCtx = spark.sqlContext
    val l = MemoryStream[Event]
    val r = MemoryStream[Event]
    val q = Streams.streamRangeJoin(l.toDF(), r.toDF(), windowSec = 60)
      .writeStream.format("memory").queryName("range_join")
      .outputMode("append").start()
    try {
      val e1 = Event(1, ts(10, 0), 1, "click", 1.0)
      val e2 = Event(2, ts(10, 30), 1, "view", 1.0)  // 30s after e1: pairs
      val e3 = Event(3, ts(11, 30), 1, "view", 1.0)  // 60s after e2: pairs (inclusive); 90s after e1: no
      val e4 = Event(4, ts(10, 15), 2, "view", 1.0)  // other user: never pairs
      l.addData(e1, e2, e3, e4)
      r.addData(e1, e2, e3, e4)
      drain(q)
      val got = spark.table("range_join")
        .select("a_id", "b_id", "gap_us").as[(Long, Long, Long)].collect().toSet
      assert(got === Set((1L, 2L, 30000000L), (2L, 3L, 60000000L)))
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the backlog and stops (incremental batch)") {
    // The production backfill pattern: run the STREAMING pipeline over
    // whatever has landed, checkpoint, and exit — same code as the
    // 24/7 stream, scheduled like a batch job.
    val tmp = java.nio.file.Files.createTempDirectory("graft-avnow").toFile
    val srcDir = new java.io.File(tmp, "src"); srcDir.mkdirs()
    try {
      Seq(Event(1, ts(1), 1, "click", 1.0), Event(2, ts(11), 2, "view", 2.0),
          Event(3, ts(300), 3, "click", 4.0))
        .toDF().withColumn("props", lit("{}"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("append").parquet(srcDir.getPath)
      val q = Streams.tumbling(Streams.eventFileStream(spark, srcDir.getPath),
          "10 minutes", "10 minutes")
        .writeStream.format("memory").queryName("avnow")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000) // AvailableNow terminates on its own
      assert(!q.isActive, "query should stop after draining the backlog")
      // windows [0,10) and [10,20) closed by the ts(300) watermark advance
      assert(spark.table("avnow").count() >= 2)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(tmp)
    }
  }

  test("file stream source reads landed parquet and the partitioned sink writes") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream").toFile
    val srcDir = new java.io.File(tmp, "src"); srcDir.mkdirs()
    val outDir = new java.io.File(tmp, "out")
    val ckDir = new java.io.File(tmp, "ck")
    try {
      // land a batch of events as a parquet file
      Seq(Event(1, ts(1), 1, "click", 1.0), Event(2, ts(11), 2, "view", 2.0))
        .toDF()
        .withColumn("props", lit("{}"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("append").parquet(srcDir.getPath)
      val stream = Streams.eventFileStream(spark, srcDir.getPath)
      assert(stream.isStreaming)
      val agg = Streams.tumbling(stream, "10 minutes", "10 minutes")
      val q = Streams.toPartitionedParquet(agg, outDir.getPath, ckDir.getPath)
      try {
        q.processAllAvailable()
        // append-mode windows flush once a later file advances the watermark
        Seq(Event(3, ts(300), 3, "click", 1.0)).toDF()
          .withColumn("props", lit("{}"))
          .select("event_id", "ts", "user_id", "event_type", "value", "props")
          .write.mode("append").parquet(srcDir.getPath)
        q.processAllAvailable()
      } finally q.stop()
      val out = spark.read.parquet(outDir.getPath)
      assert(out.columns.contains("event_date"))
      assert(out.count() >= 2) // both closed 10-min windows written
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(tmp)
    }
  }
}
