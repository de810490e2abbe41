package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException

import graft.SparkTestBase

/** The snapshot table as a Structured Streaming SOURCE: offsets are
  * table versions, each micro-batch a manifest-planned window, replay
  * deterministic — [[SnapshotStreamSource]]'s whole contract, including
  * the crash window a real deployment hits (sink effect durable, Spark
  * commit log torn) and the restart-under-admission-control case the
  * high-water mark exists for.
  */
class SnapshotStreamSourceSpec extends SparkTestBase {
  import spark.implicits._

  private def fresh(name: String): String =
    Files.createTempDirectory(s"graft_ss_$name").toString

  private def readStreamOf(table: String, opts: (String, String)*): DataFrame =
    opts.foldLeft(spark.readStream.format("graft-snapshot")) {
      case (r, (k, v)) => r.option(k, v)
    }.load(table)

  test("initial load + per-version micro-batches, exactly once, with the " +
       "pinned consumer floor tracking the stream") {
    val root = fresh("basic")
    val t = s"$root/t"
    val ckpt = s"$root/ckpt"
    Snapshots.commitOverwrite(spark, t, Seq((1L, "a"), (2L, "b")).toDF("id", "tag"))
    Snapshots.commitAppend(spark, t, Seq((3L, "c")).toDF("id", "tag"))
    Snapshots.commitAppend(spark, t, Seq((4L, "d")).toDF("id", "tag"))

    val batches = scala.collection.mutable.ArrayBuffer.empty[(Long, Set[Long])]
    val q = readStreamOf(t,
      "maxVersionsPerTrigger" -> "1", "pinConsumer" -> "repl")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, id: Long) =>
        batches.synchronized {
          batches += ((id, b.select("id").as[Long].collect().toSet)); ()
        }
      }.start()
    try {
      q.processAllAvailable()
      // batch 0 = the full snapshot at v1 (initial load), then one
      // version per trigger under the admission bound
      assert(batches.toList == List(
        (0L, Set(1L, 2L)), (1L, Set(3L)), (2L, Set(4L))))
      // the vacuum pin follows the committed batches, lagging at most
      // the in-flight one (V1 delivers commit(x) as batch x+1 starts —
      // lagging pins MORE versions, the safe direction)
      assert(Snapshots.consumers(spark, t)("repl") >= 2)
      // live tail: a new commit flows as its own delta
      Snapshots.commitAppend(spark, t, Seq((5L, "e")).toDF("id", "tag"))
      q.processAllAvailable()
      assert(batches.last == ((3L, Set(5L))))
      assert(Snapshots.consumers(spark, t)("repl") >= 3)
    } finally q.stop()
  }

  test("the worst crash window — sink effect durable, Spark commit log " +
       "torn — replays the SAME window into the SAME batch id, so a " +
       "tokened sink no-ops (end-to-end exactly-once)") {
    val root = fresh("crash")
    val t = s"$root/t"
    val dst = s"$root/dst"
    val ckpt = s"$root/ckpt"
    Snapshots.commitOverwrite(spark, t, Seq(1L, 2L).toDF("id"))
    Snapshots.commitAppend(spark, t, Seq(3L).toDF("id"))
    Snapshots.commitAppend(spark, t, Seq(4L).toDF("id"))

    def run(): Unit = {
      val q = readStreamOf(t, "maxVersionsPerTrigger" -> "1")
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, id: Long) =>
          Snapshots.commitAppendOnce(spark, dst, b, s"sink:$id"); ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(Snapshots.read(spark, dst).as[Long].collect().toSet ==
      Set(1L, 2L, 3L, 4L))
    val gens = Snapshots.versions(spark, dst).size
    assert(gens == 3) // one generation per batch

    // the crash: processing + sink commit happened, Spark's commit log
    // entry for the LAST batch is lost
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    val lost = commits.last
    assert(lost.delete())
    // the local-FS checksum sidecar goes with it (a real torn write
    // leaves neither)
    new java.io.File(lost.getParent, s".${lost.getName}.crc").delete()
    run() // restart: replays batch 2 = window (2,3] with the same token
    assert(Snapshots.versions(spark, dst).size == gens) // no new generation
    assert(Snapshots.read(spark, dst).as[Long].collect().toSet ==
      Set(1L, 2L, 3L, 4L))

    // restart again with data waiting: the high-water mark keeps
    // getOffset from offering below the committed offset, the new
    // version flows as one clean window
    Snapshots.commitAppend(spark, t, Seq(5L).toDF("id"))
    run()
    assert(Snapshots.read(spark, dst).as[Long].collect().toSet ==
      Set(1L, 2L, 3L, 4L, 5L))
    assert(Snapshots.versions(spark, dst).size == gens + 1)
  }

  test("feed mode streams row-level changes ACROSS a merge-on-read erase " +
       "and a per-batch applyChanges replica converges to the head") {
    val root = fresh("feed")
    val t = s"$root/t"
    val ckpt = s"$root/ckpt"
    Snapshots.commitOverwrite(spark, t,
      (0L until 50L).map(i => (i, s"v$i")).toDF("id", "tag"))
    Snapshots.eraseMoRCommit(spark, t, "id",
      Seq(7L, 13L).toDF("k"))
    Snapshots.commitAppend(spark, t, Seq((13L, "re")).toDF("id", "tag"))

    var replica: DataFrame = null
    val q = readStreamOf(t, "feed" -> "true", "maxVersionsPerTrigger" -> "1")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, _: Long) =>
        val rows = b.collect() // test-side: materialize the tiny window
        val batch = spark.createDataFrame(
          java.util.Arrays.asList(rows: _*), b.schema)
        replica = Option(replica) match {
          case None =>
            batch.filter(col("_op") === "u").drop("_op", "_seq")
          case Some(r) => graft.operators.Merge.applyChanges(
            r, batch, Seq("id"), "_seq", "_op")
        }
        replica = spark.createDataFrame(java.util.Arrays.asList(
          replica.collect(): _*), replica.schema)
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    val want = Snapshots.read(spark, t).as[(Long, String)].collect().toSet
    assert(replica.as[(Long, String)].collect().toSet == want)
    assert(!want.exists(_._1 == 7L) && want.contains((13L, "re")))
  }

  test("startingVersion=latest sees only post-start commits; an " +
       "overwrite mid-stream fails the stream loudly") {
    val root = fresh("latest")
    val t = s"$root/t"
    Snapshots.commitOverwrite(spark, t, Seq(1L).toDF("id"))
    Snapshots.commitAppend(spark, t, Seq(2L).toDF("id"))
    val seen = scala.collection.mutable.Set.empty[Long]
    val q = readStreamOf(t, "startingVersion" -> "latest")
      .writeStream.option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (b: DataFrame, _: Long) =>
        seen.synchronized { seen ++= b.select("id").as[Long].collect() }; ()
      }.start()
    try {
      q.processAllAvailable()
      assert(seen.isEmpty) // history before start is not replayed
      Snapshots.commitAppend(spark, t, Seq(3L).toDF("id"))
      q.processAllAvailable()
      assert(seen.toSet == Set(3L))
      // an overwrite rewrites history: the next window must fail loudly
      Snapshots.commitOverwrite(spark, t, Seq(9L).toDF("id"))
      val e = intercept[StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination(20000); ()
      }
      assert(e.getMessage.contains("append range") ||
        Option(e.getCause).exists(_.getMessage.contains("append range")))
    } finally q.stop()
  }

  test("the sink side: table-to-table replication in the pure " +
       "DataStream API, exactly-once across a torn commit log, with " +
       "stats cells riding every batch commit") {
    val root = fresh("sink")
    val src = s"$root/src"
    val dst = s"$root/dst"
    val ckpt = s"$root/ckpt"
    Snapshots.commitOverwrite(spark, src, Seq((1L, "a"), (2L, "b")).toDF("id", "tag"))
    Snapshots.commitAppend(spark, src, Seq((3L, "c")).toDF("id", "tag"))
    Snapshots.commitAppend(spark, src, Seq((4L, "d")).toDF("id", "tag"))
    def run(): Unit = {
      val q = readStreamOf(src, "maxVersionsPerTrigger" -> "1")
        .writeStream.format("graft-snapshot")
        .option("checkpointLocation", ckpt)
        .option("statsCols", "id")
        .start(dst)
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(Snapshots.read(spark, dst).select("id").as[Long].collect().toSet ==
      Set(1L, 2L, 3L, 4L))
    val gens = Snapshots.versions(spark, dst).size
    assert(gens == 3) // one tokened commit per micro-batch
    // every batch commit carried the stats pass: id cells + row counts
    assert(Snapshots.entries(spark, dst).forall(e =>
      e.stats.contains("id") && e.rows.isDefined && e.nulls.contains("id")))
    // torn commit log: the replayed batch id token-no-ops in the sink
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    val lost = commits.last
    assert(lost.delete())
    new java.io.File(lost.getParent, s".${lost.getName}.crc").delete()
    run()
    assert(Snapshots.versions(spark, dst).size == gens)
    assert(Snapshots.read(spark, dst).count() == 4)
    // update mode without its key contract rejects loudly at creation
    val e = intercept[Exception] {
      readStreamOf(src).writeStream.format("graft-snapshot")
        .outputMode("update").option("checkpointLocation", s"$root/ckpt2")
        .start(s"$root/dst2")
    }
    assert(e.getMessage.contains("mergeKey") ||
      Option(e.getCause).exists(_.getMessage.contains("mergeKey")))
  }

  test("complete-mode sink is a streaming MATERIALIZED VIEW: each " +
       "trigger's whole aggregate replaces the snapshot under the batch " +
       "token, history keeps every refresh, replays no-op") {
    val root = fresh("complete")
    val srcDir = s"$root/in"
    val dst = s"$root/mv"
    val ckpt = s"$root/ckpt"
    new java.io.File(srcDir).mkdirs()
    def drop(name: String, rows: Seq[(Long, String)], mtime: Long): Unit = {
      val tmp = new java.io.File(srcDir, name + "_tmp")
      rows.toDF("id", "k").coalesce(1).write.parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
      val f = new java.io.File(srcDir, name + ".parquet")
      java.nio.file.Files.move(part.toPath, f.toPath)
      tmp.listFiles().foreach(_.delete()); tmp.delete()
      assert(f.setLastModified(mtime))
    }
    val t0 = System.currentTimeMillis() - 600000L
    drop("b0", Seq((1L, "a"), (2L, "b")), t0)
    drop("b1", Seq((3L, "a"), (4L, "a")), t0 + 60000L)
    val src = graft.streaming.StreamRunner.fileSource(spark, srcDir,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.StringType))),
      maxFilesPerTrigger = Some(1))
    val agg = src.groupBy("k").agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("graft-snapshot").outputMode("complete")
      .option("checkpointLocation", ckpt).start(dst)
    try q.processAllAvailable() finally q.stop()
    // head = the FULL aggregate after both triggers
    assert(Snapshots.read(spark, dst).as[(String, Long)].collect().toSet ==
      Set(("a", 3L), ("b", 1L)))
    // history = one refresh per trigger (time travel over the MV)
    assert(Snapshots.versions(spark, dst).size == 2)
    assert(Snapshots.read(spark, dst, Some(1)).as[(String, Long)]
      .collect().toSet == Set(("a", 1L), ("b", 1L)))
    // torn commit log: the replayed refresh token-no-ops
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    assert(commits.last.delete())
    new java.io.File(commits.last.getParent,
      s".${commits.last.getName}.crc").delete()
    val q2 = agg.writeStream.format("graft-snapshot").outputMode("complete")
      .option("checkpointLocation", ckpt).start(dst)
    try q2.processAllAvailable() finally q2.stop()
    assert(Snapshots.versions(spark, dst).size == 2) // replay deduped
    assert(Snapshots.read(spark, dst).as[(String, Long)].collect().toSet ==
      Set(("a", 3L), ("b", 1L)))
  }

  test("update-mode sink MERGEs each batch by key into a bootstrapped " +
       "table: upserts, deletes and latest-wins collapse — the CDC " +
       "replication sink") {
    val root = fresh("updsink")
    val srcDir = s"$root/in"
    val dst = s"$root/t"
    new java.io.File(srcDir).mkdirs()
    Snapshots.commitOverwrite(spark, dst,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "tag"))
    def drop(name: String, rows: Seq[(Long, String, Long, String)],
             mtime: Long): Unit = {
      val tmp = new java.io.File(srcDir, name + "_tmp")
      rows.toDF("id", "tag", "seq", "op").coalesce(1)
        .write.parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
      val f = new java.io.File(srcDir, name + ".parquet")
      java.nio.file.Files.move(part.toPath, f.toPath)
      tmp.listFiles().foreach(_.delete()); tmp.delete()
      assert(f.setLastModified(mtime))
    }
    val t0 = System.currentTimeMillis() - 600000L
    drop("b0", Seq((2L, "B2", 1L, "u"), (4L, "d4", 1L, "u")), t0)
    drop("b1", Seq((1L, "", 2L, "d"), (2L, "B3", 2L, "u")), t0 + 60000L)
    val src = graft.streaming.StreamRunner.fileSource(spark, srcDir,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("tag",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("seq",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("op",
          org.apache.spark.sql.types.StringType))),
      maxFilesPerTrigger = Some(1))
    val q = src.writeStream.format("graft-snapshot").outputMode("update")
      .option("checkpointLocation", s"$root/ckpt")
      .option("mergeKey", "id").option("mergeSeq", "seq")
      .option("mergeOp", "op").start(dst)
    try q.processAllAvailable() finally q.stop()
    assert(Snapshots.read(spark, dst).as[(Long, String)].collect().toSet ==
      Set((2L, "B3"), (3L, "c"), (4L, "d4"))) // 1 deleted, 2 updated twice

    // token fast-path: a batch REPLAYED after a torn commit log (sink
    // effect durable, Spark's commit-log entry lost) must leave the
    // target's VERSION COUNT unchanged — the checkpointLocation-derived
    // batch token skips the re-merge, so a crash-replay loop stops
    // growing the history with content-identical versions
    val gens = Snapshots.versions(spark, dst).size
    val commits = new java.io.File(s"$root/ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    assert(commits.last.delete())
    new java.io.File(commits.last.getParent,
      s".${commits.last.getName}.crc").delete()
    val q2 = src.writeStream.format("graft-snapshot").outputMode("update")
      .option("checkpointLocation", s"$root/ckpt")
      .option("mergeKey", "id").option("mergeSeq", "seq")
      .option("mergeOp", "op").start(dst)
    try q2.processAllAvailable() finally q2.stop()
    assert(Snapshots.versions(spark, dst).size == gens,
      "a replayed batch id must token-skip the merge, not append a " +
        "content-identical version")
    assert(Snapshots.read(spark, dst).as[(Long, String)].collect().toSet ==
      Set((2L, "B3"), (3L, "c"), (4L, "d4")))
  }

  test("update mode does not demand a token prefix: a writer relying on " +
       "the session-default checkpoint root still creates (merge is " +
       "effect-idempotent without a token)") {
    val root = fresh("updnoprefix")
    val dst = s"$root/t"
    Snapshots.commitOverwrite(spark, dst, Seq((1L, "a")).toDF("id", "tag"))
    // createSink directly: Spark never passes the session-default
    // checkpoint root into the sink options, so parameters carry only
    // path + mergeKey — this must NOT error demanding checkpointLocation
    val sink = new SnapshotStreamSource().createSink(
      spark.sqlContext, Map("path" -> dst, "mergeKey" -> "id"),
      Nil, org.apache.spark.sql.streaming.OutputMode.Update())
    assert(sink.toString.contains("MergeSink"))
    // append/complete DO demand it (their exactly-once story IS the token)
    val e = intercept[RuntimeException] {
      new SnapshotStreamSource().createSink(
        spark.sqlContext, Map("path" -> dst), Nil,
        org.apache.spark.sql.streaming.OutputMode.Append())
    }
    assert(e.getMessage.contains("checkpointLocation"))
  }

  test("an initial-load window over PENDING merge-on-read deletes plans " +
       "as a stream-static anti-join (delete-key leaves stay batch) — " +
       "in both modes") {
    val root = fresh("morinit")
    val t = s"$root/t"
    Snapshots.commitOverwrite(spark, t,
      (0L until 30L).map(i => (i, s"v$i")).toDF("id", "tag"))
    Snapshots.eraseMoRCommit(spark, t, "id", Seq(3L, 7L).toDF("k"))
    // no maxVersionsPerTrigger: the FIRST window is (0, head] — the full
    // snapshot INCLUDING the MoR anti-join (the shape that crashed when
    // every leaf was marked streaming)
    for (feedMode <- Seq(false, true)) {
      val seen = scala.collection.mutable.Set.empty[Long]
      val q = readStreamOf(t, "feed" -> feedMode.toString)
        .writeStream.option("checkpointLocation", s"$root/ckpt_$feedMode")
        .foreachBatch { (b: DataFrame, _: Long) =>
          val rows = if (feedMode) b.filter(col("_op") === "u") else b
          seen.synchronized { seen ++= rows.select("id").as[Long].collect() }
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
      assert(seen == (0L until 30L).toSet -- Set(3L, 7L),
        s"feed=$feedMode must apply the pending deletes")
    }
  }

  test("a live stream SURVIVES a mid-stream compaction: dataChange=false " +
       "windows plan empty, no row duplicated or lost, and a restart " +
       "whose catch-up window SPANS the compaction stays exact") {
    val root = fresh("compact")
    val t = s"$root/t"
    val ckpt = s"$root/ckpt"
    Snapshots.commitOverwrite(spark, t,
      (0L until 10L).map(i => (i, s"v$i")).toDF("id", "tag"))        // v1
    Snapshots.commitAppend(spark, t, Seq((10L, "a")).toDF("id", "tag")) // v2
    val seen = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    def run(): Unit = {
      val q = readStreamOf(t, "maxVersionsPerTrigger" -> "1")
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, _: Long) =>
          seen.synchronized { seen += b.select("id").as[Long].collect().toSet }
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    run() // initial load (v1) + the v2 delta
    assert(seen.toList == List((0L until 10L).toSet, Set(10L)))
    // LIVE maintenance: compact, then append — the stream must cross the
    // compaction with an empty maintenance window and deliver only v4
    Snapshots.compactCommit(spark, t, 1L << 20)                      // v3
    Snapshots.commitAppend(spark, t, Seq((11L, "b")).toDF("id", "tag")) // v4
    run()
    assert(seen.toList.flatten.toSet == (0L to 11L).toSet &&
      seen.toList.map(_.size).sum == 12,
      "no row lost or duplicated across the compaction")
    assert(seen.drop(2).flatten.toSet == Set(11L),
      s"the maintenance window must contribute nothing, got ${seen.drop(2)}")
    // restart catch-up window SPANNING a compaction (no admission bound:
    // one window covers append + compaction + append)
    Snapshots.commitAppend(spark, t, Seq((12L, "c")).toDF("id", "tag")) // v5
    Snapshots.compactCommitOrdered(spark, t, 1L << 20, "id")            // v6
    Snapshots.commitAppend(spark, t, Seq((13L, "d")).toDF("id", "tag")) // v7
    val q2 = readStreamOf(t) // no maxVersionsPerTrigger: one catch-up window
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, _: Long) =>
        seen.synchronized { seen += b.select("id").as[Long].collect().toSet }
        ()
      }.start()
    try q2.processAllAvailable() finally q2.stop()
    assert(seen.last == Set(12L, 13L),
      s"the spanning window must be exactly the two appends, got ${seen.last}")
  }

  test("maxBytesPerTrigger SPLITS the initial load into file chunks — a " +
       "bootstrapped table drains in >1 batches under the cap, the " +
       "chunk union equals the snapshot, and a torn-commit-log replay " +
       "of a chunk window is deterministic") {
    val root = fresh("bytesinit")
    val t = s"$root/t"
    val dst = s"$root/dst"
    val ckpt = s"$root/ckpt"
    // ONE bootstrap commit, 8 data files — the exact shape that planned
    // as a single giant micro-batch before byte admission
    Snapshots.commitOverwrite(spark, t,
      (0L until 80L).map(i => (i, s"v$i")).toDF("id", "tag").repartition(8))
    Snapshots.commitAppend(spark, t, Seq((100L, "x")).toDF("id", "tag"))
    def run(): Unit = {
      val q = readStreamOf(t, "maxBytesPerTrigger" -> "1")
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, id: Long) =>
          Snapshots.commitAppendOnce(spark, dst, b, s"sink:$id"); ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    // cap=1 byte < every file: one chunk per file → 8 initial-load
    // batches + the v2 delta
    assert(Snapshots.versions(spark, dst).size == 9,
      s"8 chunk batches + 1 delta, got ${Snapshots.versions(spark, dst).size}")
    assert(Snapshots.read(spark, dst).select("id").as[Long].collect().toSet ==
      ((0L until 80L).toSet + 100L), "chunk union must equal the snapshot")
    // torn commit log: the replayed CHUNK window must re-plan the same
    // files (token no-op), then the new version flows
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    assert(commits.last.delete())
    new java.io.File(commits.last.getParent,
      s".${commits.last.getName}.crc").delete()
    Snapshots.commitAppend(spark, t, Seq((101L, "y")).toDF("id", "tag"))
    run()
    assert(Snapshots.versions(spark, dst).size == 10,
      "replayed chunk token-dedups; the new delta flows")
    assert(Snapshots.read(spark, dst).select("id").as[Long].collect().toSet ==
      ((0L until 80L).toSet + 100L + 101L))
  }

  test("a CHUNKED initial load over pending merge-on-read deletes " +
       "anti-joins every chunk — the union is the post-delete snapshot") {
    val root = fresh("byteschunkmor")
    val t = s"$root/t"
    Snapshots.commitOverwrite(spark, t,
      (0L until 40L).map(i => (i, s"v$i")).toDF("id", "tag").repartition(4))
    Snapshots.eraseMoRCommit(spark, t, "id", Seq(3L, 17L, 33L).toDF("k"))
    for (feedMode <- Seq(false, true)) {
      val batches = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
      val q = readStreamOf(t, "maxBytesPerTrigger" -> "1",
        "feed" -> feedMode.toString)
        .writeStream.option("checkpointLocation", s"$root/ckpt_$feedMode")
        .foreachBatch { (b: DataFrame, _: Long) =>
          val rows = if (feedMode) b.filter(col("_op") === "u") else b
          batches.synchronized {
            batches += rows.select("id").as[Long].collect().toSet }; ()
        }.start()
      try q.processAllAvailable() finally q.stop()
      assert(batches.size >= 4, s"feed=$feedMode must chunk, got ${batches.size}")
      assert(batches.reduce(_ ++ _) == (0L until 40L).toSet -- Set(3L, 17L, 33L),
        s"feed=$feedMode chunk union must apply the pending deletes")
      assert(batches.map(_.size).sum == 37,
        s"feed=$feedMode no row may appear in two chunks")
    }
  }

  test("byte admission bounds DELTA windows too: small versions batch " +
       "together under a large cap, every version isolates under a " +
       "tiny cap, and dataChange=false versions cost zero") {
    val root = fresh("bytesdelta")
    val t = s"$root/t"
    Snapshots.commitOverwrite(spark, t, Seq(1L).toDF("id"))
    // start at 'latest' so only deltas flow
    def drain(ckpt: String, cap: String): Int = {
      var n = 0
      val q = readStreamOf(t, "startingVersion" -> "1",
        "maxBytesPerTrigger" -> cap)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.count(); n += 1; ()
        }.start()
      try q.processAllAvailable() finally q.stop()
      n
    }
    Snapshots.commitAppend(spark, t, Seq(2L).toDF("id"))
    Snapshots.commitAppend(spark, t, Seq(3L).toDF("id"))
    Snapshots.compactCommit(spark, t, 1L << 20) // dataChange=false: free
    Snapshots.commitAppend(spark, t, Seq(4L).toDF("id"))
    // large cap: all four pending versions (incl. the free maintenance
    // one) admit into ONE window
    assert(drain(s"$root/ckptBig", (1L << 20).toString) == 1)
    // tiny cap: every data version isolates (the maintenance version
    // rides free with its successor or alone as an empty window)
    val isolated = drain(s"$root/ckptTiny", "1")
    assert(isolated >= 3, s"tiny cap must isolate data versions, got $isolated")
  }

  test("a table whose early history was vacuumed streams from the " +
       "earliest SURVIVING version (admission control counts committed " +
       "versions, never version arithmetic)") {
    val root = fresh("vacstart")
    val t = s"$root/t"
    Snapshots.commitOverwrite(spark, t, Seq(1L).toDF("id"))
    Snapshots.commitOverwrite(spark, t, Seq(1L, 2L).toDF("id"))
    Snapshots.commitOverwrite(spark, t, Seq(1L, 2L, 3L).toDF("id"))
    Snapshots.commitAppend(spark, t, Seq(4L).toDF("id"))
    Snapshots.vacuum(spark, t, keepFrom = 3) // versions now [3, 4]
    assert(Snapshots.versions(spark, t) == Seq(3, 4))
    val batches = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val q = readStreamOf(t, "maxVersionsPerTrigger" -> "1")
      .writeStream.option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (b: DataFrame, _: Long) =>
        batches.synchronized {
          batches += b.select("id").as[Long].collect().toSet }; ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    // batch 0 = the full snapshot at v3 (the initial-load window (0,3]
    // subsumes the vacuumed range), batch 1 = the (3,4] delta
    assert(batches.toList == List(Set(1L, 2L, 3L), Set(4L)))
  }

  test("pinConsumer registers the vacuum floor AT STREAM START, before " +
       "any batch commits") {
    val root = fresh("pinstart")
    val t = s"$root/t"
    Snapshots.commitOverwrite(spark, t, Seq(1L).toDF("id"))
    Snapshots.commitAppend(spark, t, Seq(2L).toDF("id"))
    val q = readStreamOf(t, "startingVersion" -> "latest",
      "pinConsumer" -> "floor")
      .writeStream.option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (_: DataFrame, _: Long) => () }.start()
    try {
      // caught up, zero batches — the floor must already exist at the
      // start offset, so retention cannot reclaim under the stream
      q.processAllAvailable()
      assert(Snapshots.consumers(spark, t).get("floor").contains(2))
    } finally q.stop()
  }

  test("startingVersion=latest is resolved ONCE per query: a restart " +
       "keeps the original start and admission control governs the " +
       "whole catch-up range") {
    val root = fresh("lateststart")
    val t = s"$root/t"
    Snapshots.commitOverwrite(spark, t, Seq(1L).toDF("id"))
    val batches = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    def run(): Unit = {
      val q = readStreamOf(t, "startingVersion" -> "latest",
        "maxVersionsPerTrigger" -> "1")
        .writeStream.option("checkpointLocation", s"$root/ckpt")
        .foreachBatch { (b: DataFrame, _: Long) =>
          batches.synchronized {
            batches += b.select("id").as[Long].collect().toSet }; ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(batches.isEmpty) // latest: pre-start history not replayed
    // the table races ahead while the stream is DOWN; the restart must
    // not re-resolve 'latest' (which would skip v2-v4) and must window
    // the catch-up one version per trigger
    Snapshots.commitAppend(spark, t, Seq(2L).toDF("id"))
    Snapshots.commitAppend(spark, t, Seq(3L).toDF("id"))
    Snapshots.commitAppend(spark, t, Seq(4L).toDF("id"))
    run()
    assert(batches.toList == List(Set(2L), Set(3L), Set(4L)))
  }

  test("startingTag begins strictly after the tagged version — the " +
       "reproducible-run pin as a stream start") {
    val root = fresh("starttag")
    val t = s"$root/t"
    Snapshots.commitOverwrite(spark, t, Seq(1L).toDF("id"))
    Snapshots.commitAppend(spark, t, Seq(2L).toDF("id"))
    Snapshots.tagVersion(spark, t, "run-a", 2)
    Snapshots.commitAppend(spark, t, Seq(3L).toDF("id"))
    val seen = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val q = readStreamOf(t, "startingTag" -> "run-a")
      .writeStream.option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (b: DataFrame, _: Long) =>
        seen.synchronized { seen += b.select("id").as[Long].collect().toSet }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(seen.toList == List(Set(3L)))
    // an unknown tag fails the query loudly (createSource runs on the
    // stream thread, so the error surfaces as the query's exception)
    val q2 = readStreamOf(t, "startingTag" -> "nope")
      .writeStream.option("checkpointLocation", s"$root/ckpt2")
      .foreachBatch { (_: DataFrame, _: Long) => () }.start()
    val e = intercept[StreamingQueryException] {
      try q2.processAllAvailable() finally q2.stop()
      q2.awaitTermination(20000); ()
    }
    assert(e.getMessage.contains("no tag") ||
      Option(e.getCause).exists(_.getMessage.contains("no tag")))
  }

  test("schema is pinned at stream start: an additive-evolution commit " +
       "mid-stream stays invisible (projected onto the declared shape) " +
       "until restart — and its ROWS still flow") {
    val root = fresh("evo")
    val t = s"$root/t"
    Snapshots.commitOverwrite(spark, t, Seq((1L, "a")).toDF("id", "tag"))
    val got = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = readStreamOf(t)
      .writeStream.option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (b: DataFrame, _: Long) =>
        got.synchronized {
          got += b.columns.toSeq
          rows ++= b.select("id", "tag").as[(Long, String)].collect()
        }; ()
      }.start()
    try {
      q.processAllAvailable()
      Snapshots.commitAppend(spark, t,
        Seq((2L, "b", 9L)).toDF("id", "tag", "score"), evolve = true)
      q.processAllAvailable()
      assert(got.nonEmpty && got.forall(_ == Seq("id", "tag")))
      // the evolved commit's rows arrive (projected onto the pinned
      // shape) — evolution widens the table, it never stalls the stream
      assert(rows.toSet == Set((1L, "a"), (2L, "b")))
    } finally q.stop()
  }

  test("RESTART after an additive evolution widens the stream: the same " +
       "checkpoint resumes at its offset, the new run's schema is the " +
       "evolved head shape, and a later append OMITTING the new column " +
       "null-fills") {
    val root = fresh("evorestart")
    val t = s"$root/t"
    val ckpt = s"$root/ckpt"
    Snapshots.commitOverwrite(spark, t, Seq((1L, "a")).toDF("id", "tag"))
    val run1 = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    val q1 = readStreamOf(t)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, _: Long) =>
        run1.synchronized { run1 += b.columns.toSeq }; ()
      }.start()
    try q1.processAllAvailable() finally q1.stop()
    assert(run1.toList.forall(_ == Seq("id", "tag")))

    // evolution lands while the stream is DOWN
    Snapshots.commitAppend(spark, t,
      Seq((2L, "b", 9L)).toDF("id", "tag", "score"), evolve = true)

    val run2 = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Seq[String], Set[(Long, Option[Long])])]
    val q2 = readStreamOf(t)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, id: Long) =>
        run2.synchronized {
          run2 += ((id, b.columns.toSeq,
            b.select(col("id"), col("score"))
              .as[(Long, Option[Long])].collect().toSet))
        }; ()
      }.start()
    try {
      q2.processAllAvailable()
      // resumed at the checkpoint offset (no initial-load replay), under
      // the WIDENED schema: the evolution-era row carries its score
      assert(run2.toList.map(_._2).forall(_ == Seq("id", "tag", "score")))
      assert(run2.flatMap(_._3).toSet == Set((2L, Some(9L))))
      // an append OMITTING the evolved trailing column (evolve=true's
      // omission face) null-fills in the stream exactly as in batch
      Snapshots.commitAppend(spark, t, Seq((3L, "c")).toDF("id", "tag"),
        evolve = true)
      q2.processAllAvailable()
      assert(run2.flatMap(_._3).toSet ==
        Set((2L, Some(9L)), (3L, None)))
    } finally q2.stop()
  }

  test("maxBytesPerTrigger near Long.MaxValue clamps instead of " +
       "overflowing the unknown-size sentinel: admission stays sane and " +
       "the stream drains") {
    val root = fresh("bigcap")
    val t = s"$root/t"
    Snapshots.commitOverwrite(spark, t, Seq(1L, 2L).toDF("id"))
    Snapshots.commitAppend(spark, t, Seq(3L).toDF("id"))
    val seen = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val q = readStreamOf(t, "maxBytesPerTrigger" -> Long.MaxValue.toString)
      .writeStream.option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (b: DataFrame, _: Long) =>
        seen.synchronized { seen += b.select("id").as[Long].collect().toSet }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    // an effectively-unbounded cap = the uncapped plan: ONE initial-load
    // window with everything (a negative sentinel would instead admit
    // chaotic windows or crash)
    assert(seen.flatten.toSet == Set(1L, 2L, 3L))
    assert(seen.size == 1)
  }

  test("startingTimestamp: changes strictly after the wall-clock head — " +
       "the streaming twin of timestampAsOf; pre-history and option " +
       "conflicts are loud; date/timestamp strings parse") {
    val root = fresh("startts")
    val t = s"$root/t"
    Snapshots.commitOverwrite(spark, t, Seq(1L).toDF("id"))
    Thread.sleep(5)
    val betweenV1V2 = System.currentTimeMillis()
    Thread.sleep(5)
    Snapshots.commitAppend(spark, t, Seq(2L).toDF("id"))
    Snapshots.commitAppend(spark, t, Seq(3L).toDF("id"))

    def drain(opts: (String, String)*): List[Set[Long]] = {
      val seen = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
      val q = readStreamOf(t, opts: _*)
        .writeStream
        .option("checkpointLocation",
          s"$root/ckpt${java.util.UUID.randomUUID().toString.take(8)}")
        .foreachBatch { (b: DataFrame, _: Long) =>
          seen.synchronized { seen += b.select("id").as[Long].collect().toSet }
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
      seen.toList
    }

    // epoch millis between v1 and v2 resolve to v1: the stream sees
    // exactly the post-timestamp commits
    assert(drain("startingTimestamp" -> betweenV1V2.toString)
      .flatten.toSet == Set(2L, 3L))
    // the local timestamp STRING form resolves identically
    assert(drain("startingTimestamp" ->
      new java.sql.Timestamp(betweenV1V2).toString).flatten.toSet ==
      Set(2L, 3L))
    // a far-future date string resolves to the head: caught up, no batch
    assert(drain("startingTimestamp" -> "9999-12-31").isEmpty)

    def failsWith(msg: String, opts: (String, String)*): Unit = {
      val q = readStreamOf(t, opts: _*)
        .writeStream
        .option("checkpointLocation",
          s"$root/ckpt${java.util.UUID.randomUUID().toString.take(8)}")
        .foreachBatch { (_: DataFrame, _: Long) => () }.start()
      val e = intercept[StreamingQueryException] {
        try q.processAllAvailable() finally q.stop()
        q.awaitTermination(20000); ()
      }
      assert(e.getMessage.contains(msg) ||
        Option(e.getCause).exists(c =>
          c.getMessage != null && c.getMessage.contains(msg)),
        s"expected '$msg' in: ${e.getMessage} / ${e.getCause}")
    }
    // pre-history: nothing was the head at that wall clock — loud, not
    // a silent earliest
    failsWith("no version committed at or before",
      "startingTimestamp" -> "1")
    // RESTART does not re-resolve the referent: a checkpointed stream
    // keeps running even after retention vacuums every version at or
    // before its startingTimestamp (an eager re-resolution would kill
    // the healthy query with the pre-history error above)
    val ckptR = s"$root/ckpt_restart"
    def run(): List[Set[Long]] = {
      val seen = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
      val q = readStreamOf(t, "startingTimestamp" -> betweenV1V2.toString)
        .writeStream.option("checkpointLocation", ckptR)
        .foreachBatch { (b: DataFrame, _: Long) =>
          seen.synchronized { seen += b.select("id").as[Long].collect().toSet }
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
      seen.toList
    }
    assert(run().flatten.toSet == Set(2L, 3L))
    // advance the stream past v3 first: a restart re-plans its LAST
    // window, so the vacuum horizon must stay at or below that window's
    // from-version (what pinConsumer automates) — here we only reclaim
    // v1, the timestamp's referent, far below the last window (3,4]
    Snapshots.commitAppend(spark, t, Seq(4L).toDF("id"))
    assert(run().flatten.toSet == Set(4L))
    Snapshots.vacuum(spark, t, keepFrom = 2) // v1 (the ts referent) gone
    intercept[RuntimeException] { // the referent IS gone for a NEW query
      Snapshots.versionAsOf(spark, t, betweenV1V2)
    }
    Snapshots.commitAppend(spark, t, Seq(5L).toDF("id"))
    assert(run().flatten.toSet == Set(5L),
      "the restart must resume from the checkpoint, not re-resolve " +
        "the vacuumed timestamp")
    // mutual exclusion with the other two start pins
    failsWith("at most one of",
      "startingTimestamp" -> betweenV1V2.toString,
      "startingVersion" -> "1")
    failsWith("at most one of",
      "startingTimestamp" -> betweenV1V2.toString,
      "startingTag" -> "whatever")
  }
}
