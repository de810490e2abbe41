package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MergeSpec extends SparkTestBase {

  private def snapshot() = {
    val s = spark
    import s.implicits._
    Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("id", "lang", "n")
  }

  private def run(changes: (Long, String, Long, Long, String)*) = {
    val s = spark
    import s.implicits._
    Merge.applyChanges(snapshot(),
        changes.toDF("id", "lang", "n", "seq", "op"),
        Seq("id"), "seq", "op")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
  }

  test("upsert updates matched keys and inserts unmatched; untouched rows survive") {
    assert(run((2L, "B", 21L, 1L, "u"), (9L, "z", 90L, 1L, "u")) ==
      Set((1L, "a", 10L), (2L, "B", 21L), (3L, "c", 30L), (9L, "z", 90L)))
  }

  test("latest change per key wins across a multi-change batch; deletes remove") {
    assert(run(
      (2L, "x1", 1L, 1L, "u"), (2L, "x2", 2L, 3L, "u"), (2L, "x3", 3L, 2L, "u"),
      (3L, "c", 30L, 1L, "d"),
      (9L, "z", 90L, 1L, "u"), (9L, "z", 91L, 2L, "d")) ==
      // key 2: seq 3 wins (not the last-listed seq 2); key 3 deleted;
      // key 9 inserted then deleted in the same batch -> absent
      Set((1L, "a", 10L), (2L, "x2", 2L)))
  }

  test("delete-then-reinsert within one batch lands the reinsert; delete of absent key is a no-op") {
    assert(run(
      (1L, "a", 10L, 1L, "d"), (1L, "A2", 11L, 2L, "u"),
      (7L, "q", 70L, 1L, "d")) ==
      Set((1L, "A2", 11L), (2L, "b", 20L), (3L, "c", 30L)))
  }

  test("empty change batch is the identity snapshot") {
    assert(run() == Set((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)))
  }

  test("partitioned apply rewrites only touched partitions; emptied partitions vanish; untouched files stay put") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("merge_part").toString
    Seq((1L, 10L, "a"), (2L, 20L, "a"), (3L, 30L, "b"), (4L, 40L, "c"))
      .toDF("id", "n", "lang")
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    def files(p: String) =
      new java.io.File(s"$dir/lang=$p").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified)).toSet
    val cBefore = files("c")
    val changes = Seq(
      (1L, 11L, "a", 1L, "u"),   // update in a
      (3L, 30L, "b", 1L, "d"),   // delete the ONLY row of b
      (9L, 90L, "a", 1L, "u"))   // insert into a
      .toDF("id", "n", "lang", "seq", "op")
    val affected = Merge.applyChangesPartitioned(dir, changes,
      Seq("id"), "seq", "op", "lang")
    assert(affected.toSet == Set("a", "b"))
    val after = s.read.parquet(dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(after == Set((1L, 11L, "a"), (2L, 20L, "a"), (9L, 90L, "a"),
      (4L, 40L, "c")))
    assert(!new java.io.File(s"$dir/lang=b").exists(),
      "fully-deleted partition directory must not resurrect old rows")
    assert(files("c") == cBefore, "untouched partition files must be byte-identical")
  }

  test("partitioned apply handles hive-escaped and null partition values: emptied dirs removed, null partition merged not duplicated") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("merge_esc").toString
    // partition values the writer hive-escapes (space, colon, percent) and
    // a null partition (written as __HIVE_DEFAULT_PARTITION__)
    Seq((1L, 10L, "pt br"), (2L, 20L, "a:b"), (3L, 30L, "x%y"),
        (4L, 40L, null.asInstanceOf[String]), (5L, 50L, "plain"))
      .toDF("id", "n", "lang")
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    val names = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("lang=")).toSet
    assert(names.contains("lang=x%25y") && names.contains("lang=a%3Ab"),
      s"fixture must land under hive-ESCAPED directory names, saw $names")
    val changes = Seq(
      (1L, 10L, "pt br", 1L, "d"),  // delete the ONLY row of the space partition
      (2L, 20L, "a:b", 1L, "d"),    // ... and of the colon partition
      (4L, 41L, null.asInstanceOf[String], 1L, "u")) // update inside the null partition
      .toDF("id", "n", "lang", "seq", "op")
    Merge.applyChangesPartitioned(dir, changes, Seq("id"), "seq", "op", "lang")
    val after = s.read.parquet(dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
    assert(after == Set((3L, 30L, Some("x%y")), (4L, 41L, None),
      (5L, 50L, Some("plain"))),
      s"emptied escaped partitions must not resurrect, null partition must upsert in place: $after")
    val dirsAfter = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("lang=")).toSet
    assert(!dirsAfter.exists(n => n.contains("pt") || n.contains("a%3Ab") || n.contains("a:b")),
      s"emptied partition directories must be deleted under their ESCAPED names: $dirsAfter")
  }

  test("partitioned apply deletes emptied partitions for non-string partition types (timestamp rendering)") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("merge_ts").toString
    // java.sql.Timestamp.toString renders "...12:30:45.0" — NOT what the
    // writer puts in the partition path ("...12:30:45", colons escaped).
    // The delete path must come from Spark's own cast-to-string rendering
    // or the emptied directory survives and resurrects its rows.
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t2 = java.sql.Timestamp.valueOf("2024-01-02 12:30:45")
    Seq((1L, 10L, t1), (2L, 20L, t2)).toDF("id", "n", "day")
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    val changes = Seq((2L, 20L, t2, 1L, "d")).toDF("id", "n", "day", "seq", "op")
    Merge.applyChangesPartitioned(dir, changes, Seq("id"), "seq", "op", "day")
    val after = s.read.parquet(dir).collect().map(_.getLong(0)).toSet
    assert(after == Set(1L), s"deleted key must be gone, got $after")
    val dirs = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("day=")).toSet
    assert(dirs.size == 1 && !dirs.exists(_.contains("01-02")),
      s"emptied timestamp partition must be deleted under the writer's rendering: $dirs")
  }

  test("compaction is one key-grouped exchange with map-side partials, not a join or window sort") {
    val s = spark
    import s.implicits._
    val changes = Seq((2L, "B", 21L, 1L, "u")).toDF("id", "lang", "n", "seq", "op")
    val out = Merge.applyChanges(snapshot(), changes, Seq("id"), "seq", "op")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "merge must not plan a join")
    assert(!plan.contains("Window"), "merge must not plan a window sort")
    assert(plan.contains("partial_max_by") || plan.contains("partial_maxby") ||
      "(?i)hashaggregate.*partial".r.findFirstIn(plan).isDefined,
      s"expected a partial (map-side) aggregate before the exchange:\n$plan")
  }
}
