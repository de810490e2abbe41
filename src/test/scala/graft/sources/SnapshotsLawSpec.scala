package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Model-based law for the snapshot store: a RANDOM lifecycle of
  * overwrite / append / tokened-append / compact / optimize commits,
  * replayed against a trivial in-memory model (a Vector of row-sets,
  * one per version). After every operation, EVERY live version must
  * read back exactly its model state — so version leakage, compaction
  * row loss, manifest misresolution, or stats corruption anywhere in
  * the history surfaces at the first operation that exposes it, not
  * just in the hand-written scenarios. Then one vacuum at a random
  * horizon: everything at/after the horizon still matches the model,
  * everything before is gone, and orphaned bytes are reclaimed.
  */
class SnapshotsLawSpec extends SparkTestBase {
  import spark.implicits._

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_snaplaw").toString + "/t"

  private def readIds(t: String, v: Int): Set[Long] =
    Snapshots.read(spark, t, Some(v)).select("id").as[Long].collect().toSet

  test("random lifecycle replays the model at every version; vacuum forgets exactly the horizon") {
    val rnd = new scala.util.Random(1337)
    val t = freshTable()
    var model = Vector.empty[Set[Long]] // model(v-1) = rows of version v
    var nextId = 0L
    def freshRows(): Set[Long] = {
      val n = 1 + rnd.nextInt(4)
      val rows = (nextId until nextId + n).toSet
      nextId += n
      rows
    }
    var tokens = 0
    (1 to 18).foreach { step =>
      rnd.nextInt(5) match {
        case 0 =>
          val rows = freshRows()
          Snapshots.commitOverwrite(spark, t, rows.toSeq.toDF("id"))
          model :+= rows
        case 1 | 2 if model.nonEmpty =>
          val rows = freshRows()
          Snapshots.commitAppend(spark, t, rows.toSeq.toDF("id"))
          model :+= (model.last ++ rows)
        case 3 if model.nonEmpty =>
          val rows = freshRows()
          tokens += 1
          assert(Snapshots.commitAppendOnce(spark, t,
            rows.toSeq.toDF("id"), s"tok-$tokens").isDefined)
          // immediate replay of the same token must be a no-op
          assert(Snapshots.commitAppendOnce(spark, t,
            rows.toSeq.toDF("id"), s"tok-$tokens").isEmpty)
          model :+= (model.last ++ rows)
        case 4 if model.nonEmpty && model.last.nonEmpty =>
          if (rnd.nextBoolean())
            Snapshots.compactCommit(spark, t, 1L << 20)
          else
            Snapshots.compactCommitOrdered(spark, t, 1L << 20, "id")
          model :+= model.last
        case _ => // first step must be an overwrite
          val rows = freshRows()
          Snapshots.commitOverwrite(spark, t, rows.toSeq.toDF("id"))
          model :+= rows
      }
      // EVERY live version reads back its model state, every step
      assert(Snapshots.versions(spark, t) === (1 to model.size))
      model.zipWithIndex.foreach { case (want, i) =>
        if (want.nonEmpty) assert(readIds(t, i + 1) === want,
          s"version ${i + 1} after step $step")
      }
      // pruned full-range read ≡ plain read on the head
      if (model.last.nonEmpty) {
        assert(Snapshots.readPruned(spark, t, "id", Long.MinValue, Long.MaxValue)
          .select("id").as[Long].collect().toSet === model.last)
      }
    }
    // one vacuum at a random horizon: kept versions still replay the
    // model, dropped ones are gone
    val horizon = 2 + rnd.nextInt(model.size - 2)
    Snapshots.vacuum(spark, t, keepFrom = horizon)
    assert(Snapshots.versions(spark, t) === (horizon to model.size))
    (horizon to model.size).foreach { v =>
      if (model(v - 1).nonEmpty) assert(readIds(t, v) === model(v - 1), s"post-vacuum v$v")
    }
    (1 until horizon).foreach { v =>
      intercept[IllegalArgumentException] { Snapshots.read(spark, t, Some(v)) }
    }
  }
}
