package graft.sources

import graft.SparkTestBase

/** The O(1) head-hint protocol (the Delta `_last_checkpoint` pattern):
  * every publish refreshes `_manifests/_head.hint`, head resolution
  * reads the hint + one existence probe instead of LISTing the whole
  * directory, and EVERY corruption mode — missing, stale-low, torn,
  * dangling-high, garbage — degrades to the LIST fallback or the
  * forward-probe walk, never to a wrong answer.
  */
class HeadHintSpec extends SparkTestBase {
  import spark.implicits._

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_hint").toString + "/t"

  private def hintPath(t: String) =
    java.nio.file.Paths.get(t, "_manifests", "_head.hint")

  private def setHint(t: String, content: String): Unit =
    java.nio.file.Files.write(hintPath(t), content.getBytes("UTF-8"))

  private def ids(t: String, v: Option[Int] = None): Set[Long] =
    Snapshots.read(spark, t, v).select("id").as[Long].collect().toSet

  test("publish writes the hint; head reads resolve through it") {
    val t = freshTable()
    Snapshots.commitOverwrite(spark, t, Seq(1L).toDF("id"))
    assert(java.nio.file.Files.exists(hintPath(t)))
    assert(new String(java.nio.file.Files.readAllBytes(hintPath(t)),
      "UTF-8").trim === "1")
    Snapshots.commitAppend(spark, t, Seq(2L).toDF("id"))
    assert(new String(java.nio.file.Files.readAllBytes(hintPath(t)),
      "UTF-8").trim === "2")
    assert(ids(t) === Set(1L, 2L))
  }

  test("missing hint falls back to LIST, answers correctly, and re-seeds") {
    val t = freshTable()
    Snapshots.commitOverwrite(spark, t, Seq(1L).toDF("id"))
    Snapshots.commitAppend(spark, t, Seq(2L).toDF("id"))
    java.nio.file.Files.delete(hintPath(t))
    assert(ids(t) === Set(1L, 2L)) // LIST fallback
    assert(java.nio.file.Files.exists(hintPath(t))) // re-seeded
    assert(new String(java.nio.file.Files.readAllBytes(hintPath(t)),
      "UTF-8").trim === "2")
  }

  test("stale-low hint advances by forward probes and self-heals") {
    val t = freshTable()
    Snapshots.commitOverwrite(spark, t, Seq(1L).toDF("id"))
    Snapshots.commitAppend(spark, t, Seq(2L).toDF("id"))
    Snapshots.commitAppend(spark, t, Seq(3L).toDF("id"))
    setHint(t, "1\n") // a racing committer regressed the hint
    assert(ids(t) === Set(1L, 2L, 3L)) // walks 1 -> 3
    assert(new String(java.nio.file.Files.readAllBytes(hintPath(t)),
      "UTF-8").trim === "3") // refreshed
  }

  test("garbage and dangling-high hints fall back to LIST") {
    val t = freshTable()
    Snapshots.commitOverwrite(spark, t, Seq(1L).toDF("id"))
    Snapshots.commitAppend(spark, t, Seq(2L).toDF("id"))
    for (bad <- Seq("not-a-number\n", "", "99\n", "-3\n", "123456789012\n")) {
      setHint(t, bad)
      assert(ids(t) === Set(1L, 2L), s"hint content '$bad'")
    }
    // appends still serialize correctly under a corrupted hint
    setHint(t, "oops")
    Snapshots.commitAppend(spark, t, Seq(4L).toDF("id"))
    assert(Snapshots.versions(spark, t) === Seq(1, 2, 3))
    assert(ids(t) === Set(1L, 2L, 4L))
  }

  test("hint survives vacuum and never resurrects dropped versions") {
    val t = freshTable()
    Snapshots.commitOverwrite(spark, t, Seq(1L).toDF("id"))
    Snapshots.commitOverwrite(spark, t, Seq(2L).toDF("id"))
    Snapshots.commitOverwrite(spark, t, Seq(3L).toDF("id"))
    Snapshots.vacuum(spark, t, keepFrom = 3)
    assert(ids(t) === Set(3L)) // head via hint, unaffected by the drop
    intercept[IllegalArgumentException] { Snapshots.read(spark, t, Some(1)) }
    // explicit-version validation is an existence probe: the dropped
    // version is gone whatever the hint says
    setHint(t, "1\n")
    intercept[IllegalArgumentException] { Snapshots.read(spark, t, Some(1)) }
    assert(ids(t) === Set(3L))
  }

  test("branch chains hint independently of main") {
    val t = freshTable()
    Snapshots.commitOverwrite(spark, t, Seq(1L).toDF("id"))
    Snapshots.createBranch(spark, t, "exp")
    Snapshots.commitAppendToBranch(spark, t, "exp", Seq(2L).toDF("id"))
    val bHint = java.nio.file.Paths.get(t, "_branches", "exp", "_head.hint")
    assert(java.nio.file.Files.exists(bHint))
    assert(new String(java.nio.file.Files.readAllBytes(bHint),
      "UTF-8").trim === "2")
    // main's hint untouched by branch commits
    assert(new String(java.nio.file.Files.readAllBytes(hintPath(t)),
      "UTF-8").trim === "1")
    assert(Snapshots.readBranch(spark, t, "exp")
      .select("id").as[Long].collect().toSet === Set(1L, 2L))
    assert(ids(t) === Set(1L))
  }

  test("8 concurrent committers serialize through the slot with the " +
       "hint racing them: no lost append, and the hint converges to " +
       "the true head") {
    val t = freshTable()
    Snapshots.commitOverwrite(spark, t, Seq(0L).toDF("id"))
    val barrier = new java.util.concurrent.CyclicBarrier(8)
    val failures = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 8).map { i =>
      new Thread(() => {
        try {
          barrier.await()
          Snapshots.commitAppend(spark, t, Seq(i.toLong).toDF("id"))
          ()
        } catch { case _: Throwable => failures.incrementAndGet(); () }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(failures.get() == 0)
    assert(Snapshots.versions(spark, t) === (1 to 9).toSeq,
      "every racer must land exactly once")
    assert(ids(t) === (0L to 8L).toSet)
    // the hint may briefly regress mid-race; once the dust settles a
    // single resolution converges it to the true head
    assert(ids(t) === (0L to 8L).toSet)
    assert(new String(java.nio.file.Files.readAllBytes(hintPath(t)),
      "UTF-8").trim === "9")
  }

  test("a hint regressed BELOW a vacuum gap cannot fork history: the " +
       "vacuum floor rejects it, reads stay at the true head, and an " +
       "append lands in a fresh slot — never in a freed one") {
    val t = freshTable()
    Snapshots.commitOverwrite(spark, t, Seq(1L).toDF("id"))
    for (i <- 2 to 6)
      Snapshots.commitAppend(spark, t, Seq(i.toLong).toDF("id"))
    Snapshots.tagVersion(spark, t, "pin", 3)
    Snapshots.vacuum(spark, t, keepFrom = 6) // drops v1,2,4,5 — gap at 4,5
    assert(Snapshots.versions(spark, t) === Seq(3, 6))
    // the killer scenario: a committer stalled across the vacuum
    // regresses the hint to the pinned island v3. A naive forward probe
    // would stop at exists(v4)=false, answer head=3 (stale reads), and
    // the next append would createExclusive the FREED v4 slot —
    // a forked history invisible to head readers.
    setHint(t, "3\n")
    assert(ids(t) === (1L to 6L).toSet) // true head via floor -> LIST
    val v = Snapshots.commitAppend(spark, t, Seq(7L).toDF("id"))
    assert(v === 7, s"append must land at v7, not fork into the gap (got v$v)")
    assert(Snapshots.versions(spark, t) === Seq(3, 6, 7))
    assert(ids(t) === (1L to 7L).toSet)
  }

  test("committedTokens(lastK) still remembers a LIVE pinned version's " +
       "token below the numeric window (the committed-window fallback " +
       "under the vacuum floor)") {
    val t = freshTable()
    Snapshots.commitOverwrite(spark, t, Seq(0L).toDF("id"))
    Snapshots.commitAppendOnce(spark, t, Seq(1L).toDF("id"), "tok_old") // v2
    Snapshots.tagVersion(spark, t, "pin", 2)
    for (i <- 3 to 8)
      Snapshots.commitAppendOnce(spark, t, Seq(i.toLong).toDF("id"), s"t$i")
    Snapshots.vacuum(spark, t, keepFrom = 8)
    assert(Snapshots.versions(spark, t) === Seq(2, 8))
    // numeric window [4,8] would miss live v2; the floor (8) pushes the
    // scan onto the committed-version window, which includes it
    assert(Snapshots.committedTokens(spark, t, Some(5)) ===
      Set("tok_old", "t8"))
    assert(Snapshots.commitAppendOnce(spark, t,
      Seq(99L).toDF("id"), "tok_old", replayHorizon = 5).isEmpty,
      "a replay of the pinned version's token must still no-op")
  }

  test("tokened commits dedup across vacuumed gaps in the horizon") {
    val t = freshTable()
    Snapshots.commitOverwrite(spark, t, Seq(0L).toDF("id"))
    for (i <- 1 to 5)
      Snapshots.commitAppendOnce(spark, t, Seq(i.toLong).toDF("id"), s"tok$i")
    Snapshots.tagVersion(spark, t, "pin", 3) // keeps v3 across the vacuum
    Snapshots.vacuum(spark, t, keepFrom = 5) // drops v1,v2,v4 — gap at 3
    assert(Snapshots.versions(spark, t) === Seq(3, 5, 6))
    // horizon scan reads version NUMBERS head-k+1..head; the vacuumed
    // v2/v4 read as absent (their tokens forgotten — the documented
    // dropped-manifest contract), the pinned v3 still contributes
    assert(Snapshots.committedTokens(spark, t, Some(10)) ===
      Set("tok2", "tok4", "tok5"))
    assert(Snapshots.commitAppendOnce(spark, t,
      Seq(99L).toDF("id"), "tok2").isEmpty) // replay of a live token no-ops
    assert(Snapshots.commitAppendOnce(spark, t,
      Seq(6L).toDF("id"), "tok6").nonEmpty)
  }
}
