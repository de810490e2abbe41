package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.Snapshots

class IncrementalPipelineSpec extends SparkTestBase {
  import spark.implicits._

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft_incr").toString

  // corpus docs long enough to shingle (>= 3 tokens)
  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "pack my box with five dozen liquor jugs today"),
    (3L, "how vexingly quick daft zebras jump around"))

  private def checks = Seq(
    Expectations.Check("id_band", col("doc_id") < 1000L))

  test("curateStep: delta -> index dedup -> gate -> exactly-once append") {
    val root = fresh()
    val (src, dst, qt) = (root + "/src", root + "/dst", root + "/qt")
    Snapshots.commitOverwrite(spark, src, corpus.toDF("doc_id", "text"))
    // the batch: a dup of doc 1 (identical text — every band agrees, so
    // the drop is banding-deterministic), a fresh doc, and a gate
    // violator (id >= 1000)
    val batch = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "completely novel sentence with many brand new tokens"),
      (2000L, "another completely different novel sentence entirely here"))
    Snapshots.commitAppend(spark, src, batch.toDF("doc_id", "text"))

    def step() = IncrementalPipeline.curateStep(spark, src, 1,
      Snapshots.read(spark, src, Some(1)), "doc_id", "text", checks,
      dst, token = "t1", quarantineTable = Some(qt))

    assert(step().contains(1))
    // near-dup 100 dropped, clean 101 appended, 2000 quarantined
    assert(Snapshots.read(spark, dst).select("doc_id").as[Long]
      .collect().toSet == Set(101L))
    val q = Snapshots.read(spark, qt)
    assert(q.select("doc_id").as[Long].collect().toSet == Set(2000L))
    assert(q.select("violations").as[Seq[String]].head == Seq("id_band"))

    // REPLAY: the whole composition is a no-op — one generation only
    assert(step().isEmpty)
    assert(Snapshots.versions(spark, dst) == Seq(1))
    assert(Snapshots.versions(spark, qt) == Seq(1))
    assert(Snapshots.read(spark, dst).count() == 1)
  }

  test("crash between the two commits: the retry completes exactly-once") {
    val root = fresh()
    val (src, dst, qt) = (root + "/src", root + "/dst", root + "/qt")
    Snapshots.commitOverwrite(spark, src, corpus.toDF("doc_id", "text"))
    Snapshots.commitAppend(spark, src, Seq(
      (101L, "completely novel sentence with many brand new tokens"),
      (2000L, "another completely different novel sentence entirely here"))
      .toDF("doc_id", "text"))
    // simulate: quarantine commit landed, then the process died before
    // the destination commit — the quarantine table already has token t1
    Snapshots.commitAppendOnce(spark, qt,
      Seq((2000L, "another completely different novel sentence entirely here",
        Seq("id_band"))).toDF("doc_id", "text", "violations"), "t1")
    // the retry: quarantine append is a no-op, destination completes
    val v = IncrementalPipeline.curateStep(spark, src, 1,
      Snapshots.read(spark, src, Some(1)), "doc_id", "text", checks,
      dst, token = "t1", quarantineTable = Some(qt))
    assert(v.contains(1))
    assert(Snapshots.versions(spark, qt) == Seq(1)) // still ONE generation
    assert(Snapshots.read(spark, dst).select("doc_id").as[Long]
      .collect().toSet == Set(101L))
  }

  test("curateBatch: per-micro-batch half against a prepared index, " +
       "token-exact under replay") {
    val root = fresh()
    val (dst, qt) = (root + "/dst", root + "/qt")
    val tracker = new CacheTracker
    val idx = Dedup.prepareDedupIndex(corpus.toDF("doc_id", "text"),
      "doc_id", "text", tracker = tracker)
    val batch = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"), // index dup
      (101L, "completely novel sentence with many brand new tokens"),
      (2000L, "another completely different novel sentence entirely here"))
      .toDF("doc_id", "text")
    def run() = IncrementalPipeline.curateBatch(spark, batch, idx,
      "doc_id", "text", checks, dst, token = "b0",
      quarantineTable = Some(qt))
    assert(run().contains(1))
    assert(run().isEmpty) // replayed trigger: no-op through BOTH sinks
    assert(Snapshots.read(spark, dst).select("doc_id").as[Long]
      .collect().toSet == Set(101L))
    assert(Snapshots.read(spark, qt).select("doc_id").as[Long]
      .collect().toSet == Set(2000L))
    assert(Snapshots.versions(spark, dst) == Seq(1))
    tracker.release()
  }

  test("an empty delta still commits exactly once (and replays as no-op)") {
    val root = fresh()
    val (src, dst) = (root + "/src", root + "/dst")
    Snapshots.commitOverwrite(spark, src, corpus.toDF("doc_id", "text"))
    Snapshots.commitAppend(spark, src,
      corpus.take(0).toDF("doc_id", "text")) // empty batch commit
    def step() = IncrementalPipeline.curateStep(spark, src, 1,
      Snapshots.read(spark, src, Some(1)), "doc_id", "text", checks,
      dst, token = "t1")
    assert(step().contains(1))
    assert(step().isEmpty)
    assert(Snapshots.read(spark, dst).count() == 0)
  }
}
