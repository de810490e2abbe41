package graft.operators

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SessionizeSpec extends SparkTestBase {

  test("batch sessions: gaps split, islands merge, aggregates correct") {
    val s = spark
    import s.implicits._
    // user 1: events at t=0,10,25 (one session, gap 30) then t=100 (new
    // session); user 2: single event
    val df = Seq(
      (1L, 0L, 1.0), (1L, 10L, 2.0), (1L, 25L, 3.0), (1L, 100L, 4.0),
      (2L, 5L, 9.0))
      .toDF("user_id", "ts", "value")
    val got = Sessionize.sessions(df, "user_id", "ts", "value", gap = 30L)
      .orderBy("user_id", "sid")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == Seq(
      (1L, 1L, 0L, 25L, 3L, 6.0),
      (1L, 2L, 100L, 100L, 1L, 4.0),
      (2L, 1L, 5L, 5L, 1L, 9.0)))
  }

  test("batch sessions: single exchange (window clustering reused by the aggregate)") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 0L, 1.0)).toDF("user_id", "ts", "value")
    val plan = Sessionize.sessions(df, "user_id", "ts", "value", 30L)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected one shuffle, got $exchanges:\n$plan")
  }

  test("streaming sessionize emits in-batch-closed and timeout-closed sessions") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Int) = new java.sql.Timestamp(1704100000000L + sec * 1000L)
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val df = mem.toDF().toDF("user_id", "ts", "value")
    val sessions = Sessionize.sessionizeStream(df, "user_id", "ts", "value",
      gapMs = 30000L, watermarkDelay = "5 seconds")
    val q = sessions.writeStream.format("memory")
      .queryName("stream_sessions_out").outputMode("append").start()
    try {
      // batch 1: user 1 has two sessions separated in-batch (0-10 vs 100);
      // the first closes by gap immediately, the second stays open
      mem.addData((1L, ts(0), 1.0), (1L, ts(10), 2.0), (1L, ts(100), 4.0))
      q.processAllAvailable()
      // batch 2: far-future event for user 2 pushes the watermark past
      // 100s+30s; batch 3 (empty add) lets the timeout fire
      mem.addData((2L, ts(500), 9.0))
      q.processAllAvailable()
      mem.addData((2L, ts(1000), 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("stream_sessions_out")
      .orderBy("user_id", "session_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    val t0 = 1704100000000L
    assert(got.contains((1L, t0, t0 + 10000L, 2L, 3.0)),
      s"gap-closed session missing from $got")
    assert(got.contains((1L, t0 + 100000L, t0 + 100000L, 1L, 4.0)),
      s"timeout-closed session missing from $got")
  }

  test("cross-batch straggler older than the open session does not fuse into it") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Int) = new java.sql.Timestamp(1704100000000L + sec * 1000L)
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val df = mem.toDF().toDF("user_id", "ts", "value")
    // generous watermark so the straggler is NOT dropped; gap 30s
    val q = Sessionize.sessionizeStream(df, "user_id", "ts", "value",
      gapMs = 30000L, watermarkDelay = "20 minutes")
      .writeStream.format("memory").queryName("stream_sessions_late")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts(600), 1.0))          // open session at 12:10
      q.processAllAvailable()
      mem.addData((1L, ts(0), 9.0))            // straggler from 12:00
      q.processAllAvailable()
      mem.addData((2L, ts(30000), 0.0))        // watermark push
      q.processAllAvailable()
      mem.addData((2L, ts(60000), 0.0))        // timeout flush
      q.processAllAvailable()
    } finally q.stop()
    val sessions = spark.table("stream_sessions_late")
      .filter(col("user_id") === 1L)
      .select("session_start", "session_end", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val t0 = 1704100000000L
    assert(sessions == Set((t0, t0, 1L), (t0 + 600000L, t0 + 600000L, 1L)),
      s"10-minute-apart events must be two sessions, got $sessions")
  }

  test("streaming sessions agree with batch gaps-and-islands on the same data") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Int) = new java.sql.Timestamp(1704100000000L + sec * 1000L)
    val rows = Seq(
      (1L, ts(0), 1.0), (1L, ts(5), 2.0), (1L, ts(60), 3.0),
      (3L, ts(2), 5.0), (3L, ts(90), 6.0))
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val df = mem.toDF().toDF("user_id", "ts", "value")
    val q = Sessionize.sessionizeStream(df, "user_id", "ts", "value",
      gapMs = 30000L, watermarkDelay = "1 second")
      .writeStream.format("memory").queryName("stream_sessions_eq")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      mem.addData((99L, ts(10000), 0.0)) // watermark push
      q.processAllAvailable()
      mem.addData((99L, ts(20000), 0.0)) // timeout flush
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("stream_sessions_eq")
      .filter(col("user_id") =!= 99L)
      .select("user_id", "session_start", "session_end", "n_events")
      .orderBy("user_id", "session_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val batch = Sessionize.sessions(
      rows.toDF("user_id", "ts", "value")
        .withColumn("ts_ms", col("ts").cast("long") * 1000),
      "user_id", "ts_ms", "value", gap = 30000L)
      .orderBy("user_id", "session_start")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(streamed == batch)
  }
}
