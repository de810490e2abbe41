package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The changelog-consumer contract: exactly-once incremental
  * consumption across every crash window, plan-before-process recovery,
  * racing tickers, and the vacuum floor.
  */
class SnapshotConsumerSpec extends SparkTestBase {
  import spark.implicits._

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft_consumer").toString

  private def ids(t: String): Set[Long] =
    Snapshots.read(spark, t).select("id").as[Long].collect().toSet

  private def sink(dest: String): (org.apache.spark.sql.DataFrame, String) => Unit =
    (df, token) => { Snapshots.commitAppendOnce(spark, dest, df, token); () }

  test("consumeFeed ticks across merge-on-read deletes; sequential " +
       "applied windows reproduce the head; consumeChanges stays loud") {
    val root = fresh()
    val src = root + "/src"
    Snapshots.commitOverwrite(spark, src,
      spark.range(0, 50).toDF("id").withColumn("lang", lit("en")))
    Snapshots.registerConsumer(spark, src, "feed", startVersion = 1)
    Snapshots.registerConsumer(spark, src, "plain", startVersion = 1)
    // a local downstream replica maintained purely from feed windows
    var replica = Snapshots.read(spark, src, Some(1))
    def feedTick() = Snapshots.consumeFeed(spark, src, "feed")((f, _) => {
      replica = graft.operators.Merge.applyChanges(
        replica, f, Seq("id"), "_seq", "_op")
    })
    Snapshots.commitAppend(spark, src,
      Seq((100L, "de"), (101L, "de")).toDF("id", "lang"))
    assert(feedTick().contains(2))
    assert(Snapshots.consumeChanges(spark, src, "plain")((_, _) => ())
      .contains(2))
    // the erase: the feed consumer keeps following, the plain one fails
    // its tick loudly until an operator intervenes
    Snapshots.eraseMoRCommit(spark, src, "id", Seq(7L, 100L).toDF("k"))
    Snapshots.commitAppend(spark, src, Seq((100L, "re")).toDF("id", "lang"))
    assert(feedTick().contains(4))
    intercept[IllegalArgumentException] {
      Snapshots.consumeChanges(spark, src, "plain")((_, _) => ())
    }
    assert(feedTick().isEmpty) // caught up
    val want = Snapshots.read(spark, src)
      .as[(Long, String)].collect().toSet
    assert(replica.as[(Long, String)].collect().toSet == want)
    assert(want.contains((100L, "re")) && !want.exists(_._1 == 7L))
  }

  test("tick consumes exactly the delta, batches multiple commits, " +
       "and no-ops when caught up") {
    val root = fresh()
    val (src, dst) = (root + "/src", root + "/dst")
    Snapshots.commitOverwrite(spark, src, Seq(1L, 2L).toDF("id"))   // v1
    Snapshots.registerConsumer(spark, src, "repl", startVersion = 1)
    assert(Snapshots.consumerOffset(spark, src, "repl") == 1)
    assert(Snapshots.consumeChanges(spark, src, "repl")(sink(dst)).isEmpty)
    Snapshots.commitAppend(spark, src, Seq(3L).toDF("id"))          // v2
    Snapshots.commitAppend(spark, src, Seq(4L, 5L).toDF("id"))      // v3
    // ONE tick covers both pending commits (v1..v3 window)
    assert(Snapshots.consumeChanges(spark, src, "repl")(sink(dst)).contains(3))
    assert(ids(dst) == Set(3L, 4L, 5L))
    assert(Snapshots.consumerOffset(spark, src, "repl") == 3)
    assert(Snapshots.consumeChanges(spark, src, "repl")(sink(dst)).isEmpty)
    assert(Snapshots.versions(spark, dst) == Seq(1)) // exactly one generation
  }

  test("crash windows: plan-without-commit recovers the SAME window and " +
       "token; a replayed tick is a sink no-op") {
    val root = fresh()
    val (src, dst) = (root + "/src", root + "/dst")
    Snapshots.commitOverwrite(spark, src, Seq(1L).toDF("id"))       // v1
    Snapshots.registerConsumer(spark, src, "repl", 1)
    Snapshots.commitAppend(spark, src, Seq(2L).toDF("id"))          // v2
    // crash AFTER processing, BEFORE the offset commit: simulate by
    // ticking with a sink that works, then deleting the committed offset
    var tokens = List.empty[String]
    def spySink(df: org.apache.spark.sql.DataFrame, token: String): Unit = {
      tokens ::= token
      Snapshots.commitAppendOnce(spark, dst, df, token); ()
    }
    assert(Snapshots.consumeChanges(spark, src, "repl")(spySink).contains(2))
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(src, "_consumers", "repl", "o00000002.txt"))
    val crc = java.nio.file.Paths.get(src, "_consumers", "repl",
      ".o00000002.txt.crc")
    java.nio.file.Files.deleteIfExists(crc)
    // meanwhile the source moves on — the recovery window must NOT grow
    Snapshots.commitAppend(spark, src, Seq(3L).toDF("id"))          // v3
    assert(Snapshots.consumeChanges(spark, src, "repl")(spySink).contains(2))
    assert(tokens.distinct.size == 1, s"recovery must reuse the token: $tokens")
    assert(ids(dst) == Set(2L)) // token-deduped: no double delivery
    assert(Snapshots.versions(spark, dst) == Seq(1))
    // the NEXT tick picks up v3 under a fresh generation token
    assert(Snapshots.consumeChanges(spark, src, "repl")(spySink).contains(3))
    assert(ids(dst) == Set(2L, 3L))
  }

  test("consumer state stays bounded: dead generations prune per tick") {
    val root = fresh()
    val (src, dst) = (root + "/src", root + "/dst")
    Snapshots.commitOverwrite(spark, src, Seq(0L).toDF("id"))
    Snapshots.registerConsumer(spark, src, "hot", 1)
    (1 to 6).foreach { i =>
      Snapshots.commitAppend(spark, src, Seq(i.toLong).toDF("id"))
      assert(Snapshots.consumeChanges(spark, src, "hot")(sink(dst)).isDefined)
    }
    assert(ids(dst) == (1L to 6L).toSet)
    // lagged-by-one pruning: at most o(k), o(k+1) and p(k+1) remain —
    // never one file per tick forever
    val files = java.nio.file.Files.list(
      java.nio.file.Paths.get(src, "_consumers", "hot")).iterator()
    var state = List.empty[String]
    files.forEachRemaining(p => if (!p.getFileName.toString.startsWith("."))
      state ::= p.getFileName.toString)
    assert(state.size <= 3, s"consumer state must stay bounded, got $state")
    assert(Snapshots.consumerOffset(spark, src, "hot") == 7)
  }

  test("an overwrite inside the pending window fails the tick loudly") {
    val root = fresh()
    val src = root + "/src"
    Snapshots.commitOverwrite(spark, src, Seq(1L).toDF("id"))
    Snapshots.registerConsumer(spark, src, "repl", 1)
    Snapshots.commitOverwrite(spark, src, Seq(9L).toDF("id"))
    intercept[IllegalArgumentException] {
      Snapshots.consumeChanges(spark, src, "repl")((_, _) => ())
    }
  }

  test("vacuum keeps the consumer floor; dropConsumer releases it") {
    val root = fresh()
    val src = root + "/src"
    Snapshots.commitOverwrite(spark, src, Seq(1L).toDF("id"))       // v1
    Snapshots.commitAppend(spark, src, Seq(2L).toDF("id"))          // v2
    Snapshots.commitAppend(spark, src, Seq(3L).toDF("id"))          // v3
    Snapshots.registerConsumer(spark, src, "lag", startVersion = 1)
    // a horizon above the consumer's offset must NOT drop v1 — the next
    // tick's delta is planned against it
    Snapshots.vacuum(spark, src, keepFrom = 3)
    assert(Snapshots.versions(spark, src) == Seq(1, 2, 3))
    val got = Snapshots.consumeChanges(spark, src, "lag")((df, _) =>
      assert(df.select("id").as[Long].collect().toSet == Set(2L, 3L)))
    assert(got.contains(3))
    // consumed up to the head: the floor advances and vacuum may proceed
    Snapshots.vacuum(spark, src, keepFrom = 3)
    assert(Snapshots.versions(spark, src) == Seq(3))
    Snapshots.dropConsumer(spark, src, "lag")
    assert(Snapshots.consumers(spark, src).isEmpty)
    intercept[IllegalArgumentException] {
      Snapshots.consumeChanges(spark, src, "lag")((_, _) => ())
    }
  }

  test("racing tickers resolve ONE window and ONE token; the offset " +
       "chain stays consistent") {
    // sink EFFECTS under a shared token are the single-ticker contract's
    // job (commitAppendOnce's one-writer-per-token rule — concurrent
    // same-token writers are out of contract there too); what the
    // consumer slots themselves guarantee under racing is that every
    // racer sees the SAME planned window with the SAME token, and the
    // committed offset lands exactly once
    val root = fresh()
    val src = root + "/src"
    Snapshots.commitOverwrite(spark, src, Seq(1L).toDF("id"))
    Snapshots.registerConsumer(spark, src, "race", 1)
    Snapshots.commitAppend(spark, src, spark.range(100, 200).toDF("id"))
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(String, Set[Long])]()
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Option[Int]]()
    val threads = (1 to 4).map(_ => new Thread(() => {
      results.add(Snapshots.consumeChanges(spark, src, "race") { (df, token) =>
        seen.add((token, df.select("id").as[Long].collect().toSet)); ()
      })
      ()
    }))
    threads.foreach(_.start())
    threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    assert(results.asScala.forall(_.contains(2)))
    assert(seen.asScala.map(_._1).toSet == Set("race:g2"))
    assert(seen.asScala.map(_._2).toSet == Set((100L until 200L).toSet))
    assert(Snapshots.consumerOffset(spark, src, "race") == 2)
    // exactly one committed-offset file for the generation
    val files = java.nio.file.Files.list(
      java.nio.file.Paths.get(src, "_consumers", "race")).iterator()
    var oFiles = List.empty[String]
    files.forEachRemaining(p => if (p.getFileName.toString.startsWith("o"))
      oFiles ::= p.getFileName.toString)
    assert(oFiles.sorted == List("o00000001.txt", "o00000002.txt"))
  }
}
