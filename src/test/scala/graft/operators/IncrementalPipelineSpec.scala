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

  test("accreting index: cross-batch dups caught, three-table exactly-once") {
    val root = fresh()
    val (src, dst, qt, ix) = (root + "/src", root + "/dst", root + "/qt",
      root + "/ix")
    Snapshots.commitOverwrite(spark, src, corpus.toDF("doc_id", "text"))
    IncrementalPipeline.initDedupIndex(spark, ix,
      corpus.toDF("doc_id", "text"), "doc_id", "text")
    // batch 1: a clean fresh doc (accretes) + a gate violator (never
    // accretes — quarantined rows are not in the corpus)
    Snapshots.commitAppend(spark, src, Seq(
      (100L, "completely novel sentence with many brand new tokens"),
      (2000L, "gate violating document with several distinct tokens here"))
      .toDF("doc_id", "text"))
    def step1() = IncrementalPipeline.curateStepAccreting(spark, src, 1, ix,
      "doc_id", "text", checks, dst, token = "s1",
      quarantineTable = Some(qt), toVersion = Some(2))
    assert(step1().contains(1))
    assert(step1().isEmpty) // replay: dest, quarantine AND index no-op
    assert(Snapshots.versions(spark, ix) == Seq(1, 2))
    // batch 2 (exact copies — banding-deterministic): a dup of ACCEPTED
    // 100 must drop, a dup of QUARANTINED 2000 must land, a dup of a
    // CORPUS doc must drop
    Snapshots.commitAppend(spark, src, Seq(
      (200L, "completely novel sentence with many brand new tokens"),
      (201L, "gate violating document with several distinct tokens here"),
      (202L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text"))
    def step2() = IncrementalPipeline.curateStepAccreting(spark, src, 2, ix,
      "doc_id", "text", checks, dst, token = "s2",
      quarantineTable = Some(qt))
    assert(step2().contains(2))
    assert(step2().isEmpty)
    assert(Snapshots.read(spark, dst).select("doc_id").as[Long]
      .collect().toSet == Set(100L, 201L))
    assert(Snapshots.versions(spark, ix) == Seq(1, 2, 3))
    // the index accreted EXACTLY the accepted rows' signatures
    assert(Snapshots.read(spark, ix).select("doc_id").as[Long]
      .collect().toSet == Set(1L, 2L, 3L, 100L, 201L))
  }

  test("accreting crash between destination and index: retry completes " +
       "the index commit exactly once") {
    val root = fresh()
    val (src, dst, ix) = (root + "/src", root + "/dst", root + "/ix")
    Snapshots.commitOverwrite(spark, src, corpus.toDF("doc_id", "text"))
    IncrementalPipeline.initDedupIndex(spark, ix,
      corpus.toDF("doc_id", "text"), "doc_id", "text")
    Snapshots.commitAppend(spark, src, Seq(
      (100L, "completely novel sentence with many brand new tokens"))
      .toDF("doc_id", "text"))
    // simulate: the destination commit landed under t1, then the process
    // died BEFORE the index accretion
    Snapshots.commitAppendOnce(spark, dst, Seq(
      (100L, "completely novel sentence with many brand new tokens"))
      .toDF("doc_id", "text"), "t1")
    val v = IncrementalPipeline.curateStepAccreting(spark, src, 1, ix,
      "doc_id", "text", checks, dst, token = "t1")
    assert(v.isEmpty) // dest already has t1...
    assert(Snapshots.versions(spark, dst) == Seq(1)) // ...one generation
    // ...but the index accretion COMPLETED on the retry
    assert(Snapshots.read(spark, ix).select("doc_id").as[Long]
      .collect().toSet == Set(1L, 2L, 3L, 100L))
    assert(Snapshots.versions(spark, ix) == Seq(1, 2))
  }

  test("accretion law: sequential steps == by-hand fold over " +
       "corpus + accepted-so-far, under random batch splits") {
    // 12 base docs, 12 last-word-dropped near-dups of them, 6 unrelated —
    // randomly split into 3 ordered batches. The near-dup of base i is
    // caught iff base i was ACCEPTED in an EARLIER batch (same-batch
    // pairs never interact, matching the per-step contract on both sides)
    val bases = (0 until 12).map(i =>
      (100L + i, s"base document number b$i alpha$i beta$i gamma$i delta epsilon"))
    val nearDups = (0 until 12).map(i =>
      (200L + i, s"base document number b$i alpha$i beta$i gamma$i delta"))
    val others = (0 until 6).map(i =>
      (300L + i, s"totally separate item x$i y$i z$i w$i q$i r$i"))
    val all = (bases ++ nearDups ++ others).toVector
    val gate = Seq(Expectations.Check("not_gate", col("doc_id") % 5 =!= 3))
    for (seed <- Seq(7, 23)) {
      val rnd = new scala.util.Random(seed)
      val assigned = all.map(d => (rnd.nextInt(3), d))
      val batches = (0 until 3).map(k => assigned.filter(_._1 == k).map(_._2))
      // the accreting pipeline over snapshot tables
      val root = fresh()
      val (src, dst, ix) = (root + "/src", root + "/dst", root + "/ix")
      Snapshots.commitOverwrite(spark, src, corpus.toDF("doc_id", "text"))
      IncrementalPipeline.initDedupIndex(spark, ix,
        corpus.toDF("doc_id", "text"), "doc_id", "text")
      var since = 1
      batches.zipWithIndex.foreach { case (b, i) =>
        val v = Snapshots.commitAppend(spark, src, b.toDF("doc_id", "text"))
        IncrementalPipeline.curateStepAccreting(spark, src, since, ix,
          "doc_id", "text", gate, dst, token = s"t$i", toVersion = Some(v))
        since = v
      }
      val got = Snapshots.read(spark, dst).select("doc_id").as[Long]
        .collect().toSet
      // the by-hand reference: re-seed a FIXED index from
      // corpus ∪ accepted-so-far before each batch
      var accepted = Vector.empty[(Long, String)]
      batches.foreach { b =>
        val idxDf = (corpus ++ accepted).toDF("doc_id", "text")
        val dupIds = Dedup.dedupAgainstIndex(idxDf, b.toDF("doc_id", "text"),
          "doc_id", "text").select("doc_id").as[Long].collect().toSet
        accepted ++= b.filter(r => !dupIds(r._1) && r._1 % 5 != 3)
      }
      assert(got == accepted.map(_._1).toSet, s"law broke at seed $seed")
    }
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
