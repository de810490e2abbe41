package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

/** The snapshot table format as a FIRST-CLASS Structured Streaming
  * source — `spark.readStream.format("graft-snapshot").load(table)`
  * turns a table's commit log into an unbounded DataFrame, completing
  * the format's streaming story: [[Snapshots.commitAppendOnce]] streams
  * INTO the table exactly-once, this streams OUT of it. The same
  * integration shape the log-structured lakehouse formats use (a V1
  * `Source` whose `getBatch` returns a manifest-planned DataFrame —
  * Spark's own file stream source works this way), so every batch is
  * the stock parquet scan: vectorized reading, column pruning and the
  * manifest's stats pushdown all apply per micro-batch.
  *
  * OFFSETS ARE TABLE VERSIONS: offset v = "all data through committed
  * version v". Each micro-batch is the window `(v, v']` planned from
  * the immutable manifests — [[Snapshots.streamBatch]]: O(delta +
  * commits) metadata, only the window's segments expanded — which
  * makes replay DETERMINISTIC (same window, same files, forever), the
  * property Spark's offset-log/commit-log recovery contract needs.
  * Exactly-once state lives where Spark puts it: the query CHECKPOINT
  * owns (start, end] per batch id; a crashed trigger replays the same
  * window into the same batch id, so an idempotent sink (foreachBatch
  * + [[Snapshots.commitAppendOnce]] keyed by batch id, or any
  * overwrite-by-batch-id sink) yields end-to-end exactly-once — the
  * format-level [[Snapshots.consumeChanges]] machinery is the same
  * dance for NON-Spark consumers and stays independent.
  *
  * Options:
  *  - `path` (or `.load(path)`): the table root;
  *  - `startingVersion`: `earliest` (default — the INITIAL LOAD is the
  *    full snapshot, then deltas; the lakehouse convention), `latest`
  *    (only commits after stream start), or a committed version number
  *    (changes strictly AFTER it — the [[Snapshots.registerConsumer]]
  *    convention). Resolved ONCE per query and persisted in the
  *    checkpoint metadata — a restart keeps the original resolution
  *    (`latest` re-resolved per restart would bypass admission control
  *    for the whole catch-up range and change the batch-0 replay);
  *  - `maxVersionsPerTrigger`: admission control — at most this many
  *    versions per micro-batch (the initial load counts as the window
  *    up to its bound);
  *  - `feed`: `true` streams the row-level CHANGE FEED — table columns
  *    plus `_op` ('u'/'d') and `_seq` (commit order within the window)
  *    — so the stream keeps flowing across merge-on-read erases and a
  *    replica applies each batch with `Merge.applyChanges`; default
  *    streams append deltas only and FAILS LOUDLY on a delete in the
  *    window (an append-only consumer silently missing deletes would
  *    diverge);
  *  - `pinConsumer`: a consumer name REGISTERED AT STREAM START (at the
  *    starting offset — the initial load may run long against versions
  *    a retention job would otherwise reclaim mid-scan) and advanced
  *    (via [[Snapshots.advanceConsumer]]) as Spark commits batches, so
  *    the table's VACUUM floor tracks the stream. Lags by at most the
  *    in-flight batch (the safe direction).
  *
  * dataChange=false MAINTENANCE commits (compaction / small-file
  * packing / metadata folds) inside a window are SKIPPED — they rewrite
  * segment references, never logical rows — so a live stream (and its
  * checkpointed restarts) survives routine table maintenance with zero
  * duplicate or lost rows. Overwrites inside a window still fail the
  * stream loudly (rewritten history has no incremental meaning —
  * restart from a fresh startingVersion), matching the format's
  * consumer contract.
  *
  * Per-trigger planning cost: one `_manifests` directory LIST (head
  * discovery — the same cost class as Spark's file stream source
  * listing its input directory every trigger) + the window's O(delta +
  * commits) manifest reads. Version-file count is an OPERATED bound,
  * not an accumulating one: vacuum/expireSnapshots retire old versions
  * on the retention horizon, so a production table holds 10³-10⁴ live
  * versions (a few-ms LIST), not the stream's lifetime commit count.
  *
  * SCHEMA IS PINNED AT STREAM START (Spark streams are fixed-schema):
  * each batch projects onto the declared schema by name — a column
  * added by additive evolution mid-stream stays invisible until
  * restart, a batch omitting a declared trailing column null-fills.
  *
  * Restart correctness without touching Spark internals: the source
  * persists a HIGH-WATER mark (the largest offset any `getBatch`
  * window reached) as create-once marker files under its checkpoint
  * `metadataPath`, and `getOffset` never offers below it. Without
  * this, a restarted source's first `getOffset` under
  * `maxVersionsPerTrigger` could offer an offset BELOW the
  * checkpoint's committed one — V1 compares offsets by equality, so
  * Spark would plan the inverted window `(committed, lower]` and fail.
  * Written BEFORE `getBatch` returns: every offset Spark could have
  * logged is covered, and a crash between the marker write and the
  * offset log write only makes the next window start one version
  * higher than strictly necessary — never skipping data, because the
  * next window still opens at the checkpoint's committed offset.
  */
class SnapshotStreamSource extends StreamSourceProvider with StreamSinkProvider
    with RelationProvider with CreatableRelationProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-snapshot"

  /** The BATCH-read face — what makes snapshot tables format- and
    * SQL-addressable: `spark.read.format("graft-snapshot").load(path)`
    * and `CREATE [TEMPORARY] VIEW v USING graft-snapshot OPTIONS
    * (path '...')` both land here and serve the SAME manifest-backed
    * scan [[Snapshots.read]] plans (committed schema, zero planning
    * filesystem calls, stats/bucket/null-count pushdown through the
    * manifest FileIndex). Time travel rides the reader options:
    *
    *  - `versionAsOf`: a committed version number;
    *  - `timestampAsOf`: epoch millis — the head as of that wall clock
    *    ([[Snapshots.readAsOf]] resolution);
    *  - `tag`: a [[Snapshots.tagVersion]] name (the reproducible-run pin);
    *  - `branch`: read a branch head instead of main (combinable with
    *    `versionAsOf` for a branch version).
    *
    * At most one of versionAsOf/timestampAsOf/tag. A snapshot with
    * PENDING merge-on-read deletes fails loudly (its read is an
    * anti-join plan, not a single relation — compact first or use
    * `Snapshots.read`); everything else a `Snapshots.read` serves,
    * this serves byte-identically.
    */
  override def createRelation(ctx: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val spark = ctx.sparkSession
    val table = SnapshotStreamSource.tablePath(parameters)
    val branch = parameters.get("branch")
    val picked = Seq("versionAsOf", "timestampAsOf", "tag")
      .filter(parameters.contains)
    require(picked.size <= 1,
      s"at most one of versionAsOf/timestampAsOf/tag, got ${picked.mkString(", ")}")
    val version: Option[Int] = picked.headOption.map {
      case "versionAsOf" => parameters("versionAsOf").toInt
      case "timestampAsOf" =>
        require(branch.isEmpty, "timestampAsOf reads main-chain history; " +
          "combine branch with versionAsOf instead")
        Snapshots.versionAsOf(spark, table, parameters("timestampAsOf").toLong)
      case "tag" =>
        require(branch.isEmpty, "a tag pins a MAIN version; drop the " +
          "branch option")
        val name = parameters("tag")
        Snapshots.tags(spark, table).getOrElse(name,
          sys.error(s"$table has no tag '$name'"))
    }
    org.apache.spark.sql.graftbridge.Bridge.singleBaseRelation(
      Snapshots.flatScan(spark, table, version, branch))
  }

  /** The BATCH-write face: `df.write.format("graft-snapshot")
    * .mode(...).save(path)` maps each `SaveMode` to the format commit
    * it IS — Append → [[Snapshots.commitAppend]] (with optional
    * `evolve`), Overwrite → [[Snapshots.commitOverwrite]],
    * ErrorIfExists → first commit only, Ignore → no-op on an existing
    * table. `statsCols` / `bucketCols` (`col:mod` comma list) ride the
    * commit so the written table is born prunable.
    */
  override def createRelation(ctx: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    val spark = ctx.sparkSession
    val table = SnapshotStreamSource.tablePath(parameters)
    val statsCols = parameters.get("statsCols")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    val bucketCols = parameters.get("bucketCols")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).map { cell =>
        cell.split(':') match {
          case Array(c, m) => c -> m.toInt
          case _ => sys.error(s"bucketCols cells are col:mod, got '$cell'")
        }
      }.toMap).getOrElse(Map.empty[String, Int])
    val evolve = parameters.get("evolve").exists(_.toBoolean)
    val exists = Snapshots.versions(spark, table).nonEmpty
    mode match {
      case SaveMode.Append =>
        Snapshots.commitAppend(spark, table, data, statsCols, evolve, bucketCols)
      case SaveMode.Overwrite =>
        Snapshots.commitOverwrite(spark, table, data, statsCols, bucketCols)
      case SaveMode.ErrorIfExists =>
        if (exists) throw new IllegalArgumentException(
          s"$table already has committed versions (SaveMode.ErrorIfExists)")
        Snapshots.commitOverwrite(spark, table, data, statsCols, bucketCols)
      case SaveMode.Ignore =>
        if (!exists)
          Snapshots.commitOverwrite(spark, table, data, statsCols, bucketCols)
    }
    createRelation(ctx, Map("path" -> table))
  }

  /** The WRITE side — `df.writeStream.format("graft-snapshot")
    * .option("checkpointLocation", ...).start(table)` — one sink, the
    * full output-mode matrix, each mode mapped to the format commit
    * whose semantics it IS:
    *
    *  - **Append** → [[Snapshots.commitAppendOnce]] under the
    *    deterministic token `<checkpointLocation>#b<batchId>`: Spark's
    *    at-least-once batch delivery (a replayed trigger calls
    *    `addBatch` with the SAME batch id) lands exactly-once table
    *    effects — the packaged form of the foreachBatch+token pattern
    *    every prior streaming-ingest query hand-rolled;
    *  - **Complete** → [[Snapshots.commitOverwriteOnce]] under the same
    *    token: each trigger re-emits the whole result (a streaming
    *    aggregation) and REPLACES the snapshot — the streaming
    *    MATERIALIZED VIEW: the table's head is always the latest full
    *    aggregate, history = one version per trigger (time travel over
    *    the MV's evolution), replays version-level no-ops;
    *  - **Update** → [[Snapshots.mergeIntoCommit]] keyed by the
    *    required `mergeKey` option (optional `mergeSeq`/`mergeOp` map
    *    to seqCol/opCol): each trigger's changed rows upsert/delete —
    *    the CDC-replication sink. Requires a bootstrapped target
    *    (merge needs a committed base — commitOverwrite the initial
    *    snapshot first). Merge is idempotent in EFFECT (spec-pinned:
    *    a replayed merge lands a row-identical snapshot), so replays
    *    are content-exact; they may add a content-identical version.
    *
    * The read side makes table → readStream → transforms → writeStream
    * → table a pure DataStream-API pipeline in any of the three modes.
    * Options: `statsCols` (comma list — per-file (min,max)+nulls+
    * rowcount cells ride every batch commit, so the table stays
    * prunable as it grows), `evolve` (additive schema evolution per
    * batch, Append mode), `replayHorizon` (token dedup window, default
    * 128 — matches a checkpoint's replay reality). The token prefix
    * must be stable across restarts and unique per query:
    * `checkpointLocation` is both (pass `tokenPrefix` explicitly when
    * relying on the session-default checkpoint root).
    */
  override def createSink(ctx: SQLContext, parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: OutputMode): Sink = {
    val table = SnapshotStreamSource.tablePath(parameters)
    require(partitionColumns.isEmpty,
      "graft-snapshot tables have no hive partitions; cluster via " +
        "statsCols/bucketed maintenance commits instead")
    // Append/Complete REQUIRE a stable token prefix (their exactly-once
    // story IS the token); resolved inside those branches only — update
    // mode's merge is idempotent in effect and must not spuriously
    // demand a prefix from a query relying on the session-default
    // checkpoint root (Spark does not pass that default into the sink
    // options), though it USES one as a replay fast-path when present.
    val prefixOpt = parameters.get("checkpointLocation")
      .orElse(parameters.get("tokenPrefix"))
    def prefix = prefixOpt
      .getOrElse(sys.error("graft-snapshot sink needs a stable " +
        "idempotency-token prefix: set .option(\"checkpointLocation\", ...) " +
        "on the writer (recommended) or .option(\"tokenPrefix\", ...)"))
    val statsCols = parameters.get("statsCols")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    val evolve = parameters.get("evolve").exists(_.toBoolean)
    val horizon = parameters.get("replayHorizon").map(_.toInt).getOrElse(128)
    val spark = ctx.sparkSession
    outputMode match {
      case m if m == OutputMode.Append() =>
        new SnapshotSink(spark, table, prefix, statsCols, evolve, horizon)
      case m if m == OutputMode.Complete() =>
        new SnapshotCompleteSink(spark, table, prefix, statsCols, horizon)
      case m if m == OutputMode.Update() =>
        val key = parameters.getOrElse("mergeKey", sys.error(
          "graft-snapshot sink in update mode needs .option(\"mergeKey\", " +
            "<keyCol>) — each batch's rows MERGE INTO the table by key " +
            "(optional mergeSeq/mergeOp for latest-wins collapse and " +
            "deletes)"))
        new SnapshotMergeSink(spark, table, key,
          parameters.get("mergeSeq"), parameters.get("mergeOp"), statsCols,
          prefixOpt, horizon)
      case other => sys.error(s"unsupported output mode $other")
    }
  }

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    (shortName(), SnapshotStreamSource.resolveSchema(
      ctx.sparkSession, parameters))

  override def createSource(ctx: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val spark = ctx.sparkSession
    val table = SnapshotStreamSource.tablePath(parameters)
    val declared = schema.getOrElse(
      SnapshotStreamSource.resolveSchema(spark, parameters))
    val feed = SnapshotStreamSource.feedMode(parameters)
    val vs = Snapshots.versions(spark, table)
    val start = parameters.getOrElse("startingVersion", "earliest") match {
      case "earliest" => 0L
      case "latest" => vs.last.toLong
      case n =>
        val v = n.toLong
        require(v == 0L || vs.contains(v.toInt),
          s"startingVersion $v is not 0/earliest/latest or a committed " +
            s"version of $table (have ${vs.mkString(",")})")
        v
    }
    val maxV = parameters.get("maxVersionsPerTrigger").map { m =>
      val v = m.toInt; require(v >= 1, s"maxVersionsPerTrigger must be >= 1, got $v"); v
    }
    new SnapshotSource(spark, table, declared, feed, start, maxV,
      parameters.get("pinConsumer"), metadataPath)
  }
}

object SnapshotStreamSource {
  private[sources] def tablePath(parameters: Map[String, String]): String =
    parameters.getOrElse("path", sys.error(
      "graft-snapshot source needs a table root: .load(path) or .option(\"path\", ...)"))

  private[sources] def feedMode(parameters: Map[String, String]): Boolean =
    parameters.get("feed").exists(_.toBoolean)

  private[sources] def resolveSchema(spark: SparkSession,
                                     parameters: Map[String, String]): StructType = {
    val table = tablePath(parameters)
    val vs = Snapshots.versions(spark, table)
    require(vs.nonEmpty, s"$table has no committed versions to stream from")
    val st = Snapshots.committedSchema(spark, table, vs.last).getOrElse(
      sys.error(s"$table v${vs.last} has no committed schema header; " +
        "streaming needs the committed-schema contract (any commit made " +
        "by this library records it)"))
    if (!feedMode(parameters)) st
    else {
      Snapshots.requireNoFeedColumns(table, st)
      StructType(st.fields ++ Snapshots.FeedFields)
    }
  }
}

/** One live stream's sink instance — see
  * [[SnapshotStreamSource.createSink]]. `addBatch` receives the
  * micro-batch Dataset exactly as foreachBatch does (the V1 sink
  * contract); the tokened commit makes a replayed batch id a no-op.
  */
private class SnapshotSink(spark: SparkSession, table: String,
                           tokenPrefix: String, statsCols: Seq[String],
                           evolve: Boolean, replayHorizon: Int) extends Sink {
  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // re-root the planned micro-batch as a batch Dataset (the
    // ForeachBatchSink move) — the raw addBatch df rejects batch writes
    val batch = org.apache.spark.sql.graftbridge.Bridge.asBatch(data)
    Snapshots.commitAppendOnce(spark, table, batch,
      token = s"$tokenPrefix#b$batchId", replayHorizon = replayHorizon,
      evolve = evolve, statsCols = statsCols)
    ()
  }
  override def toString: String = s"SnapshotStreamSink[$table]"
}

/** COMPLETE-mode sink: each trigger's whole result replaces the
  * snapshot under the batch token — the streaming materialized view
  * (see [[SnapshotStreamSource.createSink]]).
  */
private class SnapshotCompleteSink(spark: SparkSession, table: String,
                                   tokenPrefix: String, statsCols: Seq[String],
                                   replayHorizon: Int) extends Sink {
  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val batch = org.apache.spark.sql.graftbridge.Bridge.asBatch(data)
    Snapshots.commitOverwriteOnce(spark, table, batch,
      token = s"$tokenPrefix#b$batchId", replayHorizon = replayHorizon,
      statsCols = statsCols)
    ()
  }
  override def toString: String = s"SnapshotStreamCompleteSink[$table]"
}

/** UPDATE-mode sink: each trigger's changed rows MERGE INTO the table
  * by key — the CDC-replication sink (see
  * [[SnapshotStreamSource.createSink]]). Replay safety is merge's own
  * effect-idempotence (spec-pinned): a batch replayed after a torn
  * commit log re-merges the same collapsed rows and lands a
  * row-identical snapshot. That claim assumes ONE WRITER on the target
  * table — the same one-writer-per-token-stream contract
  * [[Snapshots.commitAppendOnce]]/[[Snapshots.commitOverwriteOnce]]
  * pin: a foreign commit interleaving between the original merge and
  * its replay would have the replay's stale rows re-merged over it for
  * the shared keys, because the table stores no per-row sequence.
  * Quiesce other writers, or route them through this stream.
  *
  * When the writer has a stable token prefix (checkpointLocation /
  * tokenPrefix — present on every real query), each batch's merge is
  * ALSO guarded by the deterministic token `<prefix>#b<batchId>`: a
  * replayed batch id whose token already committed within the replay
  * horizon SKIPS the merge entirely, so a crash-replay loop stops
  * appending content-identical versions to the target's history (and
  * the skip closes the foreign-interleave window above for every
  * replay the horizon covers).
  */
private class SnapshotMergeSink(spark: SparkSession, table: String,
                                keyCol: String, seqCol: Option[String],
                                opCol: Option[String],
                                statsCols: Seq[String],
                                tokenPrefix: Option[String],
                                replayHorizon: Int) extends Sink {
  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val batch = org.apache.spark.sql.graftbridge.Bridge.asBatch(data)
    Snapshots.mergeIntoCommit(spark, table, keyCol, batch,
      seqCol = seqCol, opCol = opCol, statsCols = statsCols,
      token = tokenPrefix.map(p => s"$p#b$batchId"),
      replayHorizon = replayHorizon)
    ()
  }
  override def toString: String = s"SnapshotStreamMergeSink[$table]"
}

/** One live stream's source instance — see [[SnapshotStreamSource]] for
  * the contract. Single-threaded per stream (Spark's microbatch driver
  * loop), so the `known` var needs no synchronization.
  */
private class SnapshotSource(spark: SparkSession, table: String,
                             declared: StructType, feed: Boolean,
                             requestedStart: Long, maxVersions: Option[Int],
                             pinConsumer: Option[String],
                             metadataPath: String) extends Source {

  private val hadoopFs =
    new Path(metadataPath).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def markers(prefix: String): Seq[Long] = {
    val dir = new Path(metadataPath)
    if (!hadoopFs.exists(dir)) Seq.empty
    else hadoopFs.listStatus(dir).map(_.getPath.getName)
      .collect { case n if n.startsWith(prefix) &&
        n.substring(prefix.length).forall(_.isDigit) &&
        n.length > prefix.length => n.substring(prefix.length).toLong }.toSeq
  }

  private def writeMarker(name: String): Unit = {
    hadoopFs.mkdirs(new Path(metadataPath))
    val p = new Path(metadataPath, name)
    try hadoopFs.create(p, false).close()
    catch {
      // ONLY the create-on-exists race is benign (a prior run won).
      // Any other write failure must surface: recordHighWater prunes
      // older hw- markers and advances `known` in memory right after
      // this call, so swallowing a transient FS failure here would
      // silently erase the restart high-water protection — after a
      // crash+restart, getOffset under maxVersionsPerTrigger could
      // offer an offset BELOW the checkpoint's committed one (an
      // inverted window V1 cannot plan).
      case e: java.io.IOException if !hadoopFs.exists(p) => throw e
      case _: java.io.IOException => ()
    }
  }

  /** The query's start offset, PERSISTED at first start (`start-<n>`
    * create-once marker): `startingVersion=latest` must resolve the
    * head exactly once per QUERY, not per restart — a restart that
    * re-resolved it would (a) jump `known` past checkpointed-but-
    * unprocessed versions, bypassing maxVersionsPerTrigger for the
    * whole catch-up range, and (b) make the batch-0 replay
    * (`getBatch(None, end)`) read a different window than the one the
    * offset log recorded.
    */
  private val startOffset: Long = markers("start-").headOption.getOrElse {
    writeMarker(s"start-$requestedStart")
    markers("start-").headOption.getOrElse(requestedStart)
  }

  // the vacuum pin exists from STREAM START, not first commit: the
  // initial load may run for minutes against versions a retention job
  // would otherwise reclaim mid-scan
  pinConsumer.foreach(n =>
    Snapshots.advanceConsumer(spark, table, n, startOffset.toInt))

  /** Largest offset any handed-out window reached: max(startOffset,
    * persisted high-water marks). Marker files are create-once
    * (`hw-<offset>`), so a crashed write never tears; stale markers are
    * pruned best-effort after each advance.
    */
  private var known: Long = (startOffset +: markers("hw-")).max

  private def recordHighWater(to: Long): Unit = if (to > known) {
    writeMarker(s"hw-$to")
    markers("hw-").filter(_ < to).foreach(n =>
      hadoopFs.delete(new Path(metadataPath, s"hw-$n"), false))
    known = to
  }

  override def schema: StructType = declared

  private def offsetValue(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong // SerializedOffset after restart
  }

  override def getOffset: Option[Offset] = {
    // admission control counts COMMITTED versions, never version-number
    // arithmetic: vacuum/expireSnapshots may have reclaimed an early or
    // (tag-pinned history) mid-chain range, and `known + m` could then
    // name a version that no longer exists — offering it would fail the
    // window and crash-loop the stream one number per restart. The
    // initial load composes: versions vacuumed below the first
    // surviving one are subsumed by the full-snapshot window (0, v₁]
    val after = Snapshots.versions(spark, table).filter(_ > known)
    val target =
      if (after.isEmpty) known
      else maxVersions.fold(after.last.toLong)(m => after.take(m).last.toLong)
    val off = math.max(target, known)
    // nothing at or before startOffset is ever a window: returning None
    // until the table moves past it avoids a spurious empty batch 0 on
    // a caught-up-at-start stream
    if (off <= startOffset) None else Some(LongOffset(off))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val from = start.map(offsetValue).getOrElse(startOffset)
    val to = offsetValue(end)
    recordHighWater(to)
    val batch = Snapshots.streamBatch(spark, table, from.toInt, to.toInt, feed)
    // project onto the DECLARED schema by name: evolution-added columns
    // stay invisible until restart, omitted trailing columns null-fill
    val have = batch.columns.toSet
    val shaped = batch.select(declared.fields.toSeq.map { f =>
      (if (have(f.name)) col(f.name).cast(f.dataType)
       else lit(null).cast(f.dataType)).as(f.name)
    }: _*)
    // in the INITIAL-LOAD window only, delete-key scans stay BATCH
    // leaves: a snapshot with pending merge-on-read deletes anti-joins
    // them, and only the stream-STATIC LeftAnti shape is plannable per
    // micro-batch. Feed DELTA windows project delete keys into rows
    // (union, not join) — there they are the window's DATA and must be
    // streaming like any other leaf (a delete-only window would
    // otherwise have no streaming leaf at all)
    org.apache.spark.sql.graftbridge.Bridge.asStreaming(shaped,
      staticLeaf =
        if (from == 0) Snapshots.isDeleteKeySchema else _ => false)
  }

  override def commit(end: Offset): Unit =
    pinConsumer.foreach(n =>
      Snapshots.advanceConsumer(spark, table, n, offsetValue(end).toInt))

  override def stop(): Unit = ()

  override def toString: String =
    s"SnapshotStreamSource[$table${if (feed) ", feed" else ""}]"
}
