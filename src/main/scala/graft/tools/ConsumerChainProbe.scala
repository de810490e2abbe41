package graft.tools

import org.apache.spark.sql.SparkSession

import graft.sources.Snapshots

/** Pins the VERSION-CHAIN and CONSUMER-TICK cost envelope at 10⁴
  * COMMITS — the complement of [[SnapshotMetaProbe]] (which grows
  * FILES through few commits): here the table takes 10⁴ one-file
  * appends, the worst commit-count shape a high-frequency streaming
  * sink produces between compactions.
  *
  * What the design predicts, and this probe measures:
  *  - a version file holds one ~50 B reference per commit since the
  *    last overwrite, so the head manifest grows LINEARLY with commits
  *    (~47 B/commit) until [[Snapshots.compactCommit]] folds the chain
  *    — an append at 10⁴ commits therefore copies ~0.5 MB of references
  *    forward (the documented O(delta + commits) caveat; this line
  *    gives the caveat its measured envelope);
  *  - a caught-up consumer's tick is O(1) regardless of history: the
  *    delta diff is set membership over the head body and only the ONE
  *    new segment expands — tick_ms must stay flat from 10² to 10⁴
  *    commits, and the consumer's on-disk state stays ≤ 3 files
  *    (lag-1 pruned generations);
  *  - compaction folds the body back to one segment, resetting the
  *    per-append metadata copy.
  *
  * Deterministic corpus; wall times vary per host, byte counts re-derive.
  */
object ConsumerChainProbe {

  private def timeMs[A](f: => A): (A, Long) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1000000L)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = java.nio.file.Files.createTempDirectory("graft_chainprobe").toString
    val t = s"$base/t"
    val dst = s"$base/dst"

    def manifestBytes(v: Int): Long = java.nio.file.Files.size(
      java.nio.file.Paths.get(t, "_manifests", f"v$v%08d.txt"))
    def consumerFiles(): Int = {
      val d = java.nio.file.Paths.get(t, "_consumers", "repl")
      if (!java.nio.file.Files.exists(d)) 0
      else {
        var n = 0
        java.nio.file.Files.list(d).iterator().forEachRemaining { p =>
          if (p.getFileName.toString.matches("[op]\\d{8}\\.txt")) n += 1
        }
        n
      }
    }

    Snapshots.commitOverwrite(spark, t,
      spark.range(0, 10).toDF("id").coalesce(1))
    Snapshots.registerConsumer(spark, t, "repl", startVersion = 1)
    def tick(): Option[Int] =
      Snapshots.consumeChanges(spark, t, "repl")((df, token) => {
        Snapshots.commitAppendOnce(spark, dst, df, token); ()
      })
    tick() // consume the base... no delta yet (offset = head = 1): no-op

    println(f"${"commits"}%8s ${"append_ms"}%10s ${"vfile_B"}%9s " +
      f"${"B_per_commit"}%13s ${"tick_ms"}%8s ${"state_files"}%12s")

    var commits = 1
    var next = 10L
    for (target <- Seq(100, 1000, 10000)) {
      while (commits < target - 1) {
        Snapshots.commitAppend(spark, t,
          spark.range(next, next + 10).toDF("id").coalesce(1))
        next += 10
        commits += 1
      }
      // catch the consumer up so the timed tick is the steady-state
      // 1-version window, not a backlog drain
      tick()
      val (v, appendMs) = timeMs {
        Snapshots.commitAppend(spark, t,
          spark.range(next, next + 10).toDF("id").coalesce(1))
      }
      next += 10
      commits += 1
      val (off, tickMs) = timeMs(tick())
      require(off.contains(v), s"tick consumed $off, head $v")
      println(f"$commits%8d $appendMs%10d ${manifestBytes(v)}%9d " +
        f"${manifestBytes(v) / commits}%13d $tickMs%8d ${consumerFiles()}%12d")
    }

    // the fold: compaction resets the body to one segment
    val (cv, compactMs) = timeMs(
      Snapshots.compactCommit(spark, t, targetFileBytes = 1L << 26))
    println(s"compact at $commits commits: ms=$compactMs " +
      s"vfile_B=${manifestBytes(cv)} (body folded to 1 segment)")
    val (_, postMs) = timeMs {
      Snapshots.commitAppend(spark, t,
        spark.range(next, next + 10).toDF("id").coalesce(1))
    }
    val head = Snapshots.versions(spark, t).last
    println(s"append after fold: ms=$postMs vfile_B=${manifestBytes(head)}")
    // the destination replicated every window exactly once
    val n = Snapshots.read(spark, dst).count()
    val nt = Snapshots.read(spark, t, Some(cv)).count()
    require(n == nt - 10, s"replica $n rows vs source-after-base ${nt - 10}")
    println(s"replica_rows=$n (source minus the pre-registration base) OK")
    spark.stop()
  }
}
