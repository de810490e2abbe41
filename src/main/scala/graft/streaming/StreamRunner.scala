package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.config.ConnectProps
import graft.transforms.Transform

/** Streaming execution: the reference IS a stream processor (Kafka Connect
  * SMTs), and every transform in this engine is a stateless narrow map —
  * so streaming parity is literally the same `Transform` chain applied to
  * a streaming DataFrame (SURVEY.md §2.2: no watermark, no state store,
  * no `(flatMap)GroupsWithState` required for parity).
  *
  * Sources/sinks:
  *  - [[kafkaSource]]/[[kafkaSink]] — the production pair; emits exactly
  *    the reference's record envelope (key, value, topic, partition,
  *    timestamp, headers). Requires the spark-sql-kafka connector jar on
  *    the cluster classpath (not present in this dev container, so these
  *    are exercised only by compilation here; file/memory paths below are
  *    the tested ones).
  *  - [[fileSource]]/[[fileSink]] — parquet-dir streaming, used by tests
  *    and usable for backfill replays.
  *  - [[memorySink]] — test sink.
  *
  * Scale: a Kafka-source stream has one Spark partition per topic
  * partition and the chain is shuffle-free, so throughput scales linearly
  * with topic partitions — the same parallelism contract as a Connect
  * worker fleet, minus the per-record envelope rebuild.
  */
object StreamRunner {

  def kafkaSource(spark: SparkSession, bootstrapServers: String, topics: String,
                  startingOffsets: String = "earliest"): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topics)
      .option("startingOffsets", startingOffsets)
      .option("includeHeaders", "true")
      .load()

  def kafkaSink(df: DataFrame, bootstrapServers: String, topic: String,
                checkpoint: String): StreamingQuery =
    df.writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .start()

  /** `maxFilesPerTrigger` bounds each micro-batch to N source files
    * (oldest modification time first) — production backpressure, and the
    * deterministic way to replay a landing zone as a KNOWN batch sequence
    * (AvailableNow honors it, draining the directory in multiple batches)
    * so watermark advancement between batches is testable.
    */
  def fileSource(spark: SparkSession, dir: String, schema: StructType,
                 maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(schema)
    maxFilesPerTrigger.fold(r)(n => r.option("maxFilesPerTrigger", n))
      .parquet(dir)
  }

  def fileSink(df: DataFrame, dir: String, checkpoint: String,
               trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", dir)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  def memorySink(df: DataFrame, queryName: String): StreamingQuery =
    df.writeStream.format("memory").queryName(queryName)
      .outputMode("append").start()

  /** foreachBatch escape hatch: run an arbitrary BATCH transformation per
    * micro-batch. This is how the batch-only operators (incremental
    * dedup against a static index, decontamination, any multi-shuffle
    * pipeline) run inside continuous ingestion: each micro-batch is a
    * small DataFrame, so the full batch operator — broadcasts, windows,
    * aggregates — applies unchanged, and `process` decides the sink.
    * Spark guarantees `process` sees each batch id at-least-once;
    * idempotent sinks (overwrite-by-batch-id, merge) make it exactly-once.
    */
  def foreachBatchSink(df: DataFrame,
                       process: (DataFrame, Long) => Unit,
                       outputMode: String = "append",
                       trigger: Option[Trigger] = None): StreamingQuery = {
    // outputMode "complete" + an overwrite in `process` is the replay
    // shape: every batch re-emits the whole aggregate, the sink keeps the
    // last one — deterministic regardless of how the source splits into
    // micro-batches (append-mode windowed aggs only flush windows the
    // watermark has passed, so a bounded replay's final windows would
    // never land in the sink)
    val w = df.writeStream.outputMode(outputMode).foreachBatch(process)
    trigger.fold(w)(w.trigger).start()
  }

  /** Beyond-parity capability: event-time tumbling/sliding windowed
    * aggregation with a watermark (counts + value sums per group). The
    * reference surface needs none of this (all transforms are stateless),
    * but a training-data ingest pipeline does — and it composes with the
    * transform chain: `windowedStats(applyChain(stream, props), ...)`.
    *
    * State scale: state store keys = groups × open windows; the watermark
    * bounds open windows, so state is O(active keys), independent of
    * stream length.
    */
  def windowedStats(events: DataFrame, tsCol: String, valueCol: String,
                    groupCol: String, windowLen: String, watermarkDelay: String,
                    slide: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.functions._
    val win = slide match {
      case Some(s) => window(col(tsCol), windowLen, s)
      case None => window(col(tsCol), windowLen)
    }
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(win.as("win"), col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum_value"))
      .select(col("win.start").as("win_start"), col("win.end").as("win_end"),
        col(groupCol), col("n"), col("sum_value"))
  }

  /** Native SESSION windows (gap-based, data-driven extent) over a
    * stream: a session stays open while events keep arriving within
    * `gap` of the last one, and closes — emitting one row — once the
    * watermark passes last_event + gap. Complements the custom
    * `Sessionize` operator (which carries per-session derived columns):
    * this is the built-in Catalyst path, state = one merging window per
    * active key, watermark-bounded.
    */
  def sessionStats(events: DataFrame, tsCol: String, valueCol: String,
                   groupCol: String, gap: String,
                   watermarkDelay: String): DataFrame = {
    import org.apache.spark.sql.functions._
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gap).as("win"), col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum_value"))
      .select(col("win.start").as("session_start"),
        col("win.end").as("session_end"),
        col(groupCol), col("n"), col("sum_value"))
  }

  /** Stream-static enrichment join: look each streaming row up against a
    * batch dimension table. Stateless (the static side is re-planned per
    * micro-batch, no state store), and with a small dimension Spark
    * broadcasts it — so at scale each micro-batch is a map-side hash join,
    * the same shape as the batch star-schema queries. `broadcastHint`
    * forces the broadcast for dimension tables whose stats undershoot the
    * auto threshold.
    */
  def streamStaticJoin(stream: DataFrame, static: DataFrame,
                       keys: Seq[String], joinType: String = "inner",
                       broadcastHint: Boolean = true): DataFrame = {
    val dim = if (broadcastHint) org.apache.spark.sql.functions.broadcast(static)
              else static
    stream.join(dim, keys, joinType)
  }

  /** Watermarked stream-stream join. Both sides get the same watermark
    * delay; `condition` must include an event-time bound between the two
    * ts columns (e.g. `r.ts BETWEEN l.ts - INTERVAL x AND l.ts`) — that
    * bound plus the watermarks is what lets Spark evict join state, so
    * state is O(rows per watermark horizon), not O(stream). Rename
    * overlapping columns before calling (standard stream-stream join
    * hygiene).
    */
  def streamStreamJoin(left: DataFrame, leftTsCol: String,
                       right: DataFrame, rightTsCol: String,
                       watermarkDelay: String,
                       condition: org.apache.spark.sql.Column,
                       joinType: String = "inner"): DataFrame =
    left.withWatermark(leftTsCol, watermarkDelay)
      .join(right.withWatermark(rightTsCol, watermarkDelay), condition, joinType)

  /** Streaming exact dedup: drop rows whose `keyCols` repeat within the
    * watermark horizon. The streaming face of [[graft.operators.Dedup]]:
    * state holds one entry per distinct key seen inside the horizon and is
    * evicted by the watermark, so state size is O(keys per horizon) — the
    * required bound for an unbounded stream (an un-watermarked
    * dropDuplicates would grow state forever on a 100 TB/day feed).
    */
  def streamingDedup(events: DataFrame, tsCol: String, keyCols: Seq[String],
                     watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Apply a Connect-style chain to a streaming DataFrame — identical code
    * path to batch ([[ConnectProps.compile]]); Structured Streaming
    * accepts it because every transform is a narrow projection.
    */
  def applyChain(stream: DataFrame, props: Map[String, String]): DataFrame =
    ConnectProps.compile(props)(stream)

  def applyTransforms(stream: DataFrame, transforms: Seq[Transform]): DataFrame =
    Transform.chain(transforms)(stream)
}
