package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.transforms.{DropField, ExtendedHoistField, StructuredToJsonString}

// top-level: Spark encoders can't reach case classes nested in a test class
case class U(user_id: Long, event_type: String)
case class V(event_id: Long, user: U, props: String)

/** Streaming equivalence (SURVEY.md §5 item 3): each transform applied to
  * a stream yields exactly the rows the batch run yields — the engine's
  * claim that parity transforms are execution-mode-agnostic.
  */
class StreamingEquivalenceSpec extends SparkTestBase {

  private val rows = Seq(
    V(1L, U(10L, "view"), """{"k":1,"nested":{"x":2}}"""),
    V(2L, U(20L, "click"), """{"k":2,"nested":{"x":3}}"""),
    V(3L, U(30L, "error"), """{"k":3,"nested":{"x":4}}"""))

  private def chain = Seq(
    DropField("user", Seq("event_type")),
    DropField("props", Seq("nested.x")),
    ExtendedHoistField("props", "wrapped", Seq("k")))

  test("MemoryStream: transform chain output is identical to batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[V]
    mem.addData(rows: _*)

    val streamed = StreamRunner.applyTransforms(mem.toDF(), chain)
    val q = StreamRunner.memorySink(streamed, "stream_equiv_out")
    try q.processAllAvailable() finally q.stop()

    val batch = StreamRunner.applyTransforms(rows.toDF(), chain)
    val got = spark.table("stream_equiv_out").orderBy("event_id").collect().toSeq
    val want = batch.orderBy("event_id").collect().toSeq
    assert(got == want)
    assert(got.map(_.getAs[Row]("user").length) == Seq(1, 1, 1)) // event_type dropped
    assert(got.head.getAs[String]("props") == """{"k":1,"wrapped":{"nested":{}}}""")
  }

  test("file-stream source → chain → parquet sink round-trips (AvailableNow)") {
    val srcDir = Files.createTempDirectory("graft_stream_src").toString
    val outDir = Files.createTempDirectory("graft_stream_out").toString
    val ckpt = Files.createTempDirectory("graft_stream_ckpt").toString
    val s = spark
    import s.implicits._
    rows.toDF().write.mode("overwrite").parquet(srcDir)

    val src = StreamRunner.fileSource(spark, srcDir, rows.toDF().schema)
    val q = StreamRunner.fileSink(
      StreamRunner.applyTransforms(src, chain), outDir, ckpt)
    q.awaitTermination(60000)

    val got = spark.read.parquet(outDir).orderBy("event_id").collect().toSeq
    val want = StreamRunner.applyTransforms(rows.toDF(), chain)
      .orderBy("event_id").collect().toSeq
    assert(got == want)
  }

  test("checkpointed file sink restarts exactly-once (no reprocessing, no loss)") {
    val srcDir = Files.createTempDirectory("graft_restart_src").toString
    val outDir = Files.createTempDirectory("graft_restart_out").toString
    val ckpt = Files.createTempDirectory("graft_restart_ckpt").toString
    val s = spark
    import s.implicits._
    val schema = rows.toDF().schema

    // run 1: first batch of input
    rows.take(2).toDF().write.mode("append").parquet(srcDir)
    val q1 = StreamRunner.fileSink(
      StreamRunner.applyTransforms(StreamRunner.fileSource(spark, srcDir, schema), chain),
      outDir, ckpt)
    assert(q1.awaitTermination(60000), "run 1 must terminate before restart")

    // more input lands while no query is running; run 2 resumes from the
    // SAME checkpoint — it must process only the new file
    rows.drop(2).toDF().write.mode("append").parquet(srcDir)
    val q2 = StreamRunner.fileSink(
      StreamRunner.applyTransforms(StreamRunner.fileSource(spark, srcDir, schema), chain),
      outDir, ckpt)
    assert(q2.awaitTermination(60000), "run 2 must terminate")

    val got = spark.read.parquet(outDir).orderBy("event_id").collect().toSeq
    val want = StreamRunner.applyTransforms(rows.toDF(), chain)
      .orderBy("event_id").collect().toSeq
    assert(got == want,
      s"restart must neither duplicate batch-1 rows nor drop batch-2 rows: $got")
  }

  test("windowed aggregation with watermark emits closed windows (append mode)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val agg = StreamRunner.windowedStats(df, "ts", "value", "event_type",
      "5 minutes", "1 minute")
    val q = StreamRunner.memorySink(agg, "stream_window_out")
    try {
      mem.addData((ts(0), "view", 1.0), (ts(1), "view", 2.0), (ts(3), "click", 5.0))
      q.processAllAvailable()
      // advance the watermark far enough to close the 10:00-10:05 window
      mem.addData((ts(30), "view", 9.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("stream_window_out")
      .orderBy("event_type").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n"),
        r.getAs[Double]("sum_value"))).toSeq
    assert(rows == Seq(("click", 1L, 5.0), ("view", 2L, 3.0)))
  }

  test("native session windows merge within the gap and close after watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    def ts(sec: Int) = new java.sql.Timestamp(1704103200000L + sec * 1000L)
    val df = mem.toDF().toDF("ts", "user", "value")
    val agg = StreamRunner.sessionStats(df, "ts", "value", "user",
      gap = "10 seconds", watermarkDelay = "1 second")
    val q = StreamRunner.memorySink(agg, "stream_session_out")
    try {
      // u1: events at 0s, 5s, 12s chain into ONE session (each within 10s
      // of the previous); u2: events at 0s and 30s are TWO sessions
      mem.addData((ts(0), "u1", 1.0), (ts(5), "u1", 2.0), (ts(12), "u1", 4.0),
        (ts(0), "u2", 8.0), (ts(30), "u2", 16.0))
      q.processAllAvailable()
      mem.addData((ts(120), "u3", 0.0)) // advance watermark → close all
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("stream_session_out")
      .orderBy("user", "session_start").collect()
      .map(r => (r.getAs[String]("user"), r.getAs[Long]("n"),
        r.getAs[Double]("sum_value"))).toSeq
    assert(rows == Seq(("u1", 3L, 7.0), ("u2", 1L, 8.0), ("u2", 1L, 16.0)),
      s"u1 one merged session, u2 two: $rows")
  }

  test("streaming dedup: duplicate keys within the watermark horizon are dropped") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Int) = new java.sql.Timestamp(1704100000000L + sec * 1000L)
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "k", "value")
    val deduped = StreamRunner.streamingDedup(df, "ts", Seq("k"), "10 seconds")
    val q = StreamRunner.memorySink(deduped, "stream_dedup_out")
    try {
      // k=a arrives 3× within the horizon (once in a later batch), k=b once
      mem.addData((ts(0), "a", 1.0), (ts(1), "a", 2.0), (ts(2), "b", 3.0))
      q.processAllAvailable()
      mem.addData((ts(3), "a", 4.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("stream_dedup_out").orderBy("k")
      .collect().map(r => (r.getString(1), r.getDouble(2))).toSeq
    assert(got == Seq(("a", 1.0), ("b", 3.0)),
      s"first arrival per key survives, got $got")
  }

  test("stream-stream interval join matches purchases to their recent errors") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Int) = new java.sql.Timestamp(1704100000000L + sec * 1000L)
    val purchases = MemoryStream[(Long, java.sql.Timestamp)]
    val errors = MemoryStream[(Long, java.sql.Timestamp)]
    val p = purchases.toDF().toDF("p_user", "p_ts")
    val e = errors.toDF().toDF("e_user", "e_ts")
    val joined = StreamRunner.streamStreamJoin(p, "p_ts", e, "e_ts", "5 seconds",
      col("p_user") === col("e_user") &&
        col("e_ts") >= col("p_ts") - expr("INTERVAL 30 seconds") &&
        col("e_ts") <= col("p_ts"))
    val q = StreamRunner.memorySink(
      joined.select("p_user", "p_ts", "e_ts"), "stream_ssjoin_out")
    try {
      // user 1: error 10s before purchase (match); user 2: error 60s
      // before purchase (outside the 30s lookback — no match)
      errors.addData((1L, ts(0)), (2L, ts(0)))
      purchases.addData((1L, ts(10)), (2L, ts(60)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("stream_ssjoin_out")
      .collect().map(r => (r.getLong(0), r.getTimestamp(2).getTime)).toSeq
    assert(got == Seq((1L, 1704100000000L)),
      s"only user 1's in-window error should join, got $got")
  }

  test("stream-stream join drops input rows that arrive below the watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Int) = new java.sql.Timestamp(1704100000000L + sec * 1000L)
    val purchases = MemoryStream[(Long, java.sql.Timestamp)]
    val errors = MemoryStream[(Long, java.sql.Timestamp)]
    val p = purchases.toDF().toDF("p_user", "p_ts")
    val e = errors.toDF().toDF("e_user", "e_ts")
    val joined = StreamRunner.streamStreamJoin(p, "p_ts", e, "e_ts", "5 seconds",
      col("p_user") === col("e_user") &&
        col("e_ts") >= col("p_ts") - expr("INTERVAL 30 seconds") &&
        col("e_ts") <= col("p_ts"))
    val q = StreamRunner.memorySink(
      joined.select("p_user", "p_ts", "e_ts"), "stream_ssjoin_late_out")
    try {
      // b1 advances both watermarks to ~t495 (delay 5s); user 1 matches
      errors.addData((1L, ts(0)), (7L, ts(500)))
      purchases.addData((1L, ts(10)), (8L, ts(500)))
      q.processAllAvailable()
      // b2: user 1 re-purchases at t20 — BELOW the watermark. If the
      // join did not drop late input, the (1, t0) error could still
      // produce a second match row; the state store must refuse it.
      purchases.addData((1L, ts(20)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("stream_ssjoin_late_out")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime)).toSeq
    assert(got == Seq((1L, 1704100010000L)),
      s"only the on-time b1 match may surface — the late t20 purchase " +
        s"must be dropped at ingestion, got $got")
  }

  test("left-outer stream-stream join emits the unmatched row after watermark eviction") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Int) = new java.sql.Timestamp(1704100000000L + sec * 1000L)
    val purchases = MemoryStream[(Long, java.sql.Timestamp)]
    val errors = MemoryStream[(Long, java.sql.Timestamp)]
    val p = purchases.toDF().toDF("p_user", "p_ts")
    val e = errors.toDF().toDF("e_user", "e_ts")
    val joined = StreamRunner.streamStreamJoin(p, "p_ts", e, "e_ts", "5 seconds",
      col("p_user") === col("e_user") &&
        col("e_ts") >= col("p_ts") - expr("INTERVAL 30 seconds") &&
        col("e_ts") <= col("p_ts"),
      joinType = "leftOuter")
    val q = StreamRunner.memorySink(
      joined.select("p_user", "p_ts", "e_ts"), "stream_ssjoin_lo_out")
    try {
      // user 1 has a matching error; user 2 has none. The null-extended
      // row for user 2 can only be emitted once BOTH watermarks pass its
      // join window (t60 + 30s lookback + 5s delay), so later batches
      // advance event time past that point first.
      errors.addData((1L, ts(0)))
      purchases.addData((1L, ts(10)), (2L, ts(60)))
      q.processAllAvailable()
      errors.addData((99L, ts(300)))
      purchases.addData((99L, ts(300)))
      q.processAllAvailable()
      errors.addData((98L, ts(600)))
      purchases.addData((98L, ts(600)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("stream_ssjoin_lo_out")
      .filter(col("p_user") <= 2L)
      .collect().map(r => (r.getLong(0), Option(r.getTimestamp(2)))).toSeq
      .sortBy(_._1)
    assert(got == Seq((1L, Some(new java.sql.Timestamp(1704100000000L))),
      (2L, None)),
      s"user 1 joins its error, user 2 surfaces null-extended, got $got")
  }

  test("stream-static join enriches streaming rows from a broadcast dimension") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((10L, "gold"), (20L, "silver")).toDF("user_id", "tier")
    val mem = MemoryStream[(Long, Long)]
    val df = mem.toDF().toDF("event_id", "user_id")
    val joined = StreamRunner.streamStaticJoin(df, dim, Seq("user_id"), "left")
    val q = StreamRunner.memorySink(joined, "stream_enrich_out")
    try {
      mem.addData((1L, 10L), (2L, 20L), (3L, 30L))
      q.processAllAvailable()
      // second micro-batch re-reads the same static side
      mem.addData((4L, 10L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("stream_enrich_out")
      .collect().map(r => (r.getLong(1), Option(r.getString(2)).getOrElse("none")))
      .toSeq.sorted
    assert(got == Seq((1L, "gold"), (2L, "silver"), (3L, "none"), (4L, "gold")),
      s"each micro-batch row must pick up its dim attributes, got $got")
  }

  test("transformWithState running totals accumulate across micro-batches (RocksDB)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val conf = spark.conf
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = conf.getOption(key)
    conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Double)]
      val df = mem.toDF().toDF("user_id", "value")
      val q = RunningTotals.runningTotals(df, "user_id", "value")
        .writeStream.format("memory").queryName("stream_totals_out")
        .outputMode("update").start()
      try {
        mem.addData((1L, 1.0), (1L, 2.0), (2L, 5.0))
        q.processAllAvailable()
        mem.addData((1L, 4.0))
        q.processAllAvailable()
      } finally q.stop()
      val byBatch = spark.table("stream_totals_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(byBatch.contains((1L, 2L, 3.0)), s"batch-1 totals for user 1 in $byBatch")
      assert(byBatch.contains((1L, 3L, 7.0)), s"state carried into batch 2: $byBatch")
      assert(byBatch.contains((2L, 1L, 5.0)))
    } finally saved match {
      case Some(v) => conf.set(key, v)
      case None => conf.unset(key)
    }
  }

  test("curation chain (quality score + PII redact) is stream/batch identical") {
    // the LLM-curation narrow ops are plain Column expressions, so the
    // SAME code runs on a stream — the micro-batch ingestion shape: score,
    // filter, redact as documents arrive
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "a solid document with enough words to pass the quality bar and no pii"),
      (2L, "short spam 111 222 333 444 555 666 777 888 999 000 111 222"),
      (3L, "contact me at someone@example.com or 555-0123 for more details"))
    def curate(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("q_score", graft.operators.TextAnalysis.linearQualityScore(
        col("text"), Seq("n_tokens" -> 2L, "mean_tok_len_x100" -> 1L,
          "punct_cnt" -> -5L, "digit_cnt" -> -10L)))
      .filter(col("q_score") >= 300L)
      .withColumn("clean", graft.operators.TextAnalysis.redactPii(col("text")))
      .select("doc_id", "q_score", "clean")
    val mem = MemoryStream[(Long, String)]
    mem.addData(docs: _*)
    val q = StreamRunner.memorySink(
      curate(mem.toDF().toDF("doc_id", "text")), "stream_curate_out")
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("stream_curate_out").orderBy("doc_id").collect().toSeq
    val want = curate(docs.toDF("doc_id", "text")).orderBy("doc_id").collect().toSeq
    assert(got == want)
    assert(got.map(_.getLong(0)).contains(3L))
    assert(got.find(_.getLong(0) == 3L).get.getAs[String]("clean")
      .contains("<EMAIL>"), "PII masked in the streaming output")
    assert(!got.map(_.getLong(0)).contains(2L), "digit-heavy spam filtered out")
  }

  test("foreachBatch: incremental dedup against a static index per micro-batch") {
    // the production ingestion shape: each arriving micro-batch of
    // documents is matched against the standing corpus index with the
    // full BATCH operator (broadcasts and all), unchanged
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val index = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (1L, "a completely different document about spark query engines and columnar data"))
      .toDF("doc_id", "text")
    val matches = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val mem = MemoryStream[(Long, String)]
    val q = StreamRunner.foreachBatchSink(
      mem.toDF().toDF("doc_id", "text"),
      (batch, _) => matches.synchronized {
        matches ++= graft.operators.Dedup
          .dedupAgainstIndex(index, batch, "doc_id", "text")
          .collect().map(r => (r.getLong(0), r.getLong(1)))
      })
    try {
      mem.addData(
        (100L, "the quick brown fox jumps over the lazy dog near the river bank"),
        (101L, "entirely novel content no index document resembles in any way at all"))
      q.processAllAvailable()
      mem.addData(
        (102L, "a completely different document about spark query engines and columnar data"))
      q.processAllAvailable()
    } finally q.stop()
    assert(matches.toSet == Set(100L -> 0L, 102L -> 1L),
      s"near-dups matched per batch, novel doc passed: $matches")
  }

  test("foreachBatch: CDC apply per micro-batch converges to the one-shot merge") {
    // the streaming half of Merge.applyChanges: a CDC feed lands in
    // micro-batches and each batch folds into the running snapshot with
    // the BATCH operator, unchanged. With a batch-monotone sequence (what
    // a CDC log's LSN is), per-batch latest-wins composes: the final
    // snapshot equals applying the whole change log at once.
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val initial = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "lang", "n")
    val b1 = Seq((2L, "x", 21L, 1L, "u"), (9L, "z", 90L, 2L, "u"))
    val b2 = Seq((2L, "b", 20L, 3L, "d"), (9L, "z2", 91L, 4L, "u"))
    @volatile var snapshot = initial
    val mem = MemoryStream[(Long, String, Long, Long, String)]
    val q = StreamRunner.foreachBatchSink(
      mem.toDF().toDF("id", "lang", "n", "seq", "op"),
      (batch, _) => synchronized {
        // materialize: the next batch's plan must not re-read this one's
        val next = graft.operators.Merge
          .applyChanges(snapshot, batch, Seq("id"), "seq", "op")
          .collect()
        snapshot = s.createDataFrame(
          s.sparkContext.parallelize(next.toSeq), snapshot.schema)
      })
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = snapshot.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val oneShot = graft.operators.Merge.applyChanges(initial,
        (b1 ++ b2).toDF("id", "lang", "n", "seq", "op"),
        Seq("id"), "seq", "op")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == oneShot)
    assert(streamed == Set((1L, "a", 10L), (9L, "z2", 91L)),
      "update then delete of key 2, insert then update of key 9")
  }

  test("foreachBatch: prepared standing index matches per-batch, equals the one-shot result") {
    // the q_stream_dedup shape: index signatures computed and persisted
    // ONCE before the stream; each micro-batch only signatures itself.
    // The streamed union must equal running the whole batch at once
    // (batch-vs-index matching has no batch-vs-batch interaction).
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val index = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (1L, "a completely different document about spark query engines and columnar data"))
      .toDF("doc_id", "text")
    val b1 = Seq((100L, "the quick brown fox jumps over the lazy dog near the river bank"))
    val b2 = Seq(
      (101L, "entirely novel content no index document resembles in any way at all"),
      (102L, "a completely different document about spark query engines and columnar data"))
    val tracker = new graft.operators.CacheTracker
    val idx = graft.operators.Dedup.prepareDedupIndex(index, "doc_id", "text",
      tracker = tracker)
    val matches = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val mem = MemoryStream[(Long, String)]
    val q = StreamRunner.foreachBatchSink(
      mem.toDF().toDF("doc_id", "text"),
      (batch, _) => matches.synchronized {
        val bt = new graft.operators.CacheTracker
        matches ++= graft.operators.Dedup
          .dedupAgainstPreparedIndex(idx, batch, "doc_id", "text", tracker = bt)
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        bt.release()
      })
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally { q.stop(); tracker.release() }
    val oneShot = graft.operators.Dedup
      .dedupAgainstIndex(index, (b1 ++ b2).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(matches.toSet == oneShot,
      s"streamed union ${matches.toSet} must equal one-shot $oneShot")
    assert(matches.toSet == Set(100L -> 0L, 102L -> 1L))
  }

  test("map→json transform works on a stream (to_json parity op)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    mem.addData((1L, """{"k": 5}"""), (2L, """{"k": 6}"""))
    val df = mem.toDF().toDF("id", "props")
      .withColumn("m", from_json(col("props"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.LongType)))
    val q = StreamRunner.memorySink(
      StructuredToJsonString("m")(df).select("id", "m"), "stream_tojson_out")
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("stream_tojson_out").orderBy("id")
      .collect().map(_.getString(1)).toSeq
    assert(got == Seq("""{"k":5}""", """{"k":6}"""))
  }
}
