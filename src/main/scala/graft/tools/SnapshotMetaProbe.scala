package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.sources.Snapshots

/** Measures the r15 segment format's COMMIT METADATA cost directly —
  * the number the manifest-segment design is justified by:
  *
  *   1. grows one table to 10⁴ files through 100-file appends, and at
  *      each decade (10², 10³, 10⁴ files) times a 1-file stats-carrying
  *      append and records the metadata BYTES that commit wrote
  *      (version file + its one new segment). Flat = O(delta); the
  *      pre-r15 format wrote the full expanded file list instead
  *      (`filelist_bytes`, also reported — what a 10⁴-file table would
  *      pay per commit without segments);
  *   2. times full-snapshot planning (read → inputFiles, i.e. version
  *      read + every segment expand + parse) and incremental planning
  *      (readChangesBetween head-1 → head, which opens ONLY the delta's
  *      segment) at each decade;
  *   3. erase pruning: on a 16-file range-clustered table, the
  *      [[Snapshots.erasePlan]] split for keys living in 2 bands —
  *      the k-of-N partial-rewrite evidence.
  *
  * Deterministic corpus (spark.range), wall times vary per host; the
  * byte and file counts re-derive bit-for-bit.
  */
object SnapshotMetaProbe {

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

    val base = java.nio.file.Files.createTempDirectory("graft_snapmeta").toString
    val t = s"$base/t"

    def segmentBytes(): Long = {
      val d = java.nio.file.Paths.get(t, "_segments")
      if (!java.nio.file.Files.exists(d)) 0L
      else {
        var s = 0L
        java.nio.file.Files.list(d).iterator().forEachRemaining { p =>
          if (p.getFileName.toString.matches("s-.*\\.txt"))
            s += java.nio.file.Files.size(p)
        }
        s
      }
    }
    def manifestBytes(v: Int): Long = java.nio.file.Files.size(
      java.nio.file.Paths.get(t, "_manifests", f"v$v%08d.txt"))

    println(f"${"files"}%8s ${"append_ms"}%10s ${"commit_meta_B"}%14s " +
      f"${"filelist_B"}%12s ${"B_per_file"}%10s ${"meta_ms"}%8s ${"plan_ms"}%8s " +
      f"${"delta_plan_ms"}%14s")

    var files = 0
    var next = 0L
    for (target <- Seq(100, 1000, 10000)) {
      while (files < target) {
        val batch = math.min(100, target - files)
        Snapshots.commitAppend(spark, t,
          spark.range(next, next + batch * 10).toDF("id").repartition(batch))
        next += batch * 10
        files += batch
      }
      // a representative commit: 1 new file, id stats carried
      val segBefore = segmentBytes()
      val (v, appendMs) = timeMs {
        Snapshots.commitAppend(spark, t,
          spark.range(next, next + 10).toDF("id").repartition(1),
          statsCols = Seq("id"))
      }
      next += 10
      files += 1
      val commitMeta = manifestBytes(v) + (segmentBytes() - segBefore)
      val fileListBytes = segmentBytes() // expanded data lines ≈ all segments
      // metadata-only planning: version read + segment expand + parse —
      // the cost the FORMAT owns; plan_ms adds scan construction, which
      // since the manifest-backed FileIndex (committed lengths, zero
      // FileStatus calls) is metadata-bound too — it was 18.4 s at 10⁴
      // files through spark.read's per-path stat pass before
      val (nEntries, metaMs) = timeMs(Snapshots.entries(spark, t).length)
      require(nEntries == files, s"parsed $nEntries of $files")
      val (nFiles, planMs) = timeMs(Snapshots.read(spark, t).inputFiles.length)
      require(nFiles == files, s"planned $nFiles of $files")
      val (dFiles, deltaMs) = timeMs(
        Snapshots.readChangesBetween(spark, t, v - 1).inputFiles.length)
      require(dFiles == 1, s"delta planned $dFiles files")
      println(f"$files%8d $appendMs%10d $commitMeta%14d $fileListBytes%12d " +
        f"${fileListBytes / files}%10d $metaMs%8d $planMs%8d $deltaMs%14d")
    }

    // merge-on-read erase on the 10⁴-file table: the O(keys) logical
    // delete — metadata written is one key file + one version file,
    // regardless of the 10⁴ data files
    val morManifests = s"$base/t/_manifests"
    def dirBytes(d: String): Long = {
      var s = 0L
      java.nio.file.Files.list(java.nio.file.Paths.get(d)).iterator()
        .forEachRemaining(p => s += java.nio.file.Files.size(p))
      s
    }
    val preBytes = dirBytes(morManifests) + segmentBytes()
    import spark.implicits._
    val (mv, morMs) = timeMs {
      Snapshots.eraseMoRCommit(spark, t, "id",
        spark.range(0, 1000, 10).toDF("key"))
    }
    val morMeta = dirBytes(morManifests) + segmentBytes() - preBytes
    val (morPlanned, morPlanMs) = timeMs(
      Snapshots.read(spark, t).inputFiles.length)
    println(s"mor_erase at $files files: commit_ms=$morMs " +
      s"commit_meta_B=$morMeta (vs $files data files untouched), " +
      s"head_plan_ms=$morPlanMs planned=$morPlanned v=$mv")

    // erase pruning: keys in 2 of 16 disjoint bands
    val e = s"$base/erase"
    Snapshots.commitOverwrite(spark, e,
      spark.range(0, 1600).toDF("id")
        .repartitionByRange(16, col("id")).sortWithinPartitions("id"),
      statsCols = Seq("id"))
    val plan = Snapshots.erasePlan(spark, e, "id",
      Seq(150L, 160L, 950L).toDF("key"))
    println(s"erase_plan: rewrite=${plan.rewrite.size} of 16, " +
      s"carried_by_reference=${plan.carry.size}")

    // merge planning on the same clustered table: updates in 2 bands +
    // inserts beyond every band — the executor touch probe narrows the
    // rewrite to the matched files only
    val msrc = Seq(150L, 160L, 950L, 99999L, 99998L).toDF("id")
    val mplan = Snapshots.mergeTouchPlan(spark, e, "id", msrc)
    println(s"merge_plan: rewrite=${mplan.rewrite.size} of 16, " +
      s"carried_by_reference=${mplan.carry.size} (2 update bands, " +
      "2 insert keys beyond all bands)")

    // bucket occupancy vs min/max on a HASH-DISTRIBUTED key: same data,
    // same layout, with and without bucket cells — the equality-pruning
    // evidence (min/max alone must rewrite everything)
    val b1 = s"$base/bucketed"
    val b0 = s"$base/unbucketed"
    val bdf = spark.range(0, 100000).toDF("id")
      .repartition(64, org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.xxhash64(col("id")),
        org.apache.spark.sql.functions.lit(64L)))
    Snapshots.commitOverwrite(spark, b1, bdf,
      statsCols = Seq("id"), bucketCols = Map("id" -> 64))
    Snapshots.commitOverwrite(spark, b0, bdf, statsCols = Seq("id"))
    val bkeys = Seq(5L, 777L, 54321L).toDF("key")
    val bp1 = Snapshots.erasePlan(spark, b1, "id", bkeys)
    val bp0 = Snapshots.erasePlan(spark, b0, "id", bkeys)
    val nb = Snapshots.entries(spark, b1).size
    println(s"bucket_plan: 3-key erase on hash-distributed id over $nb " +
      s"files: with bucket cells rewrite=${bp1.rewrite.size}, " +
      s"min/max only rewrite=${bp0.rewrite.size}")
    val (lkFiles, lkMs) = timeMs(
      Snapshots.readPrunedByKey(spark, b1, "id", Seq(5L, 777L, 54321L))
        .inputFiles.length)
    println(s"bucket_lookup: 3-key point read plans $lkFiles of $nb files " +
      s"in ${lkMs}ms")
    spark.stop()
  }
}
