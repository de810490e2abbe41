package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The snapshot table's BATCH format addressability —
  * [[SnapshotStreamSource.createRelation]]: `spark.read.format(
  * "graft-snapshot")` (with time-travel options) and SQL-text reads
  * through `CREATE TEMPORARY VIEW ... USING graft-snapshot` must serve
  * exactly what [[Snapshots.read]] serves, and the batch WRITE face
  * must map each SaveMode to the format commit it is.
  */
class SnapshotRelationSpec extends SparkTestBase {
  import spark.implicits._

  private def fresh(name: String): String =
    Files.createTempDirectory(s"graft_rel_$name").toString + "/t"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.as[(Long, String)].collect().toSet

  test("format read == Snapshots.read, including versionAsOf / " +
       "timestampAsOf / tag / branch time travel") {
    val t = fresh("read")
    Snapshots.commitOverwrite(spark, t,
      Seq((1L, "a"), (2L, "b")).toDF("id", "tag"), statsCols = Seq("id"))
    val ts1 = System.currentTimeMillis()
    Thread.sleep(5)
    Snapshots.commitAppend(spark, t, Seq((3L, "c")).toDF("id", "tag"),
      statsCols = Seq("id"))
    Snapshots.tagVersion(spark, t, "run-x", 1)
    Snapshots.createBranch(spark, t, "exp")
    Snapshots.commitAppendToBranch(spark, t, "exp", Seq((9L, "z")).toDF("id", "tag"))

    def fmt(opts: (String, String)*) =
      opts.foldLeft(spark.read.format("graft-snapshot")) {
        case (r, (k, v)) => r.option(k, v)
      }.load(t)

    assert(rows(fmt()) == rows(Snapshots.read(spark, t)))
    assert(rows(fmt("versionAsOf" -> "1")) ==
      rows(Snapshots.read(spark, t, Some(1))))
    assert(rows(fmt("timestampAsOf" -> ts1.toString)) ==
      rows(Snapshots.read(spark, t, Some(1))))
    assert(rows(fmt("tag" -> "run-x")) == rows(Snapshots.readTag(spark, t, "run-x")))
    assert(rows(fmt("branch" -> "exp")) ==
      rows(Snapshots.readBranch(spark, t, "exp")))
    // the format read plans the SAME manifest-backed scan: committed
    // schema (no footer reads) and the closed file list
    assert(fmt().schema == Snapshots.read(spark, t).schema)
    assert(fmt().inputFiles.toSet == Snapshots.read(spark, t).inputFiles.toSet)
    // option conflicts and unknown names fail loudly
    intercept[IllegalArgumentException] {
      fmt("versionAsOf" -> "1", "tag" -> "run-x").collect()
    }
    intercept[RuntimeException] { fmt("tag" -> "nope").collect() }
  }

  test("SQL-text reads: CREATE TEMPORARY VIEW ... USING graft-snapshot " +
       "serves the snapshot to plain spark.sql") {
    val t = fresh("sql")
    Snapshots.commitOverwrite(spark, t,
      (0L until 20L).map(i => (i, if (i % 2 == 0) "even" else "odd"))
        .toDF("id", "tag"), statsCols = Seq("id"))
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW snap_sql_v " +
      s"USING `graft-snapshot` OPTIONS (path '$t')")
    val got = spark.sql(
      "SELECT tag, count(*) AS n, sum(id) AS s FROM snap_sql_v " +
        "WHERE id >= 10 GROUP BY tag ORDER BY tag")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("even", 5L, 70L), ("odd", 5L, 75L)))
    // time travel through view options too
    Snapshots.commitAppend(spark, t, Seq((100L, "even")).toDF("id", "tag"))
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW snap_sql_v1 " +
      s"USING `graft-snapshot` OPTIONS (path '$t', versionAsOf '1')")
    assert(spark.sql("SELECT count(*) FROM snap_sql_v1").head().getLong(0) == 20)
    assert(spark.sql("SELECT count(*) FROM snap_sql_v").head().getLong(0) == 20,
      "a view resolves its relation at creation: the pinned file list " +
        "stays the creation-time snapshot")
  }

  test("a snapshot with PENDING merge-on-read deletes SERVES its full " +
       "delete semantics through the batch/SQL face — the same anti-join " +
       "plan Snapshots.read uses, with pruning and filters replayed") {
    val t = fresh("mor")
    Snapshots.commitOverwrite(spark, t,
      (0L until 10L).map(i => (i, s"v$i")).toDF("id", "tag"),
      statsCols = Seq("id"))
    Snapshots.eraseMoRCommit(spark, t, "id", Seq(3L, 7L).toDF("k"))
    // the format read mid-erase = Snapshots.read mid-erase (deletes
    // applied), NOT the un-deleted superset and NOT a rejection
    val got = spark.read.format("graft-snapshot").load(t)
    assert(got.select("id").as[Long].collect().toSet ==
      (0L until 10L).toSet -- Set(3L, 7L))
    assert(rows(got) == rows(Snapshots.read(spark, t)))
    // column pruning + filters replay onto the MoR plan (count/aggregate
    // and predicated reads all answer correctly through the relation)
    assert(got.count() == 8)
    assert(got.filter(col("id") >= 5).select("id").as[Long]
      .collect().toSet == Set(5L, 6L, 8L, 9L))
    // a re-inserted key after its delete survives — the relation keeps
    // the MoR commit-order scoping, byte-identical to Snapshots.read
    Snapshots.commitAppend(spark, t, Seq((3L, "back")).toDF("id", "tag"))
    assert(rows(spark.read.format("graft-snapshot").load(t)) ==
      rows(Snapshots.read(spark, t)))
    assert(rows(spark.read.format("graft-snapshot").load(t))
      .contains((3L, "back")))
    // SQL face too: a view over the mid-erase table answers with the
    // delete semantics (no dead end for the SQL user)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW snap_mor_v " +
      s"USING `graft-snapshot` OPTIONS (path '$t')")
    assert(spark.sql("SELECT count(*) FROM snap_mor_v").head().getLong(0) == 9)
    assert(spark.sql(
      "SELECT sum(id) FROM snap_mor_v WHERE id < 5").head().getLong(0) ==
      0L + 1 + 2 + 3 + 4)
    // compaction folds the deletes; the flat single-relation fast path
    // serves the same rows after
    Snapshots.compactCommit(spark, t, 1L << 20)
    assert(spark.read.format("graft-snapshot").load(t)
      .select("id").as[Long].collect().toSet ==
      ((0L until 10L).toSet -- Set(7L)))
  }

  test("timestampAsOf accepts date and timestamp STRINGS as well as " +
       "epoch millis; garbage names the accepted forms") {
    val t = fresh("ts")
    Snapshots.commitOverwrite(spark, t, Seq((1L, "a")).toDF("id", "tag"))
    val afterV1 = System.currentTimeMillis()
    Thread.sleep(5)
    Snapshots.commitAppend(spark, t, Seq((2L, "b")).toDF("id", "tag"))
    def at(ts: String) = spark.read.format("graft-snapshot")
      .option("timestampAsOf", ts).load(t)
    assert(rows(at(afterV1.toString)) == Set((1L, "a"))) // epoch millis
    val tsStr = new java.sql.Timestamp(afterV1).toString // local wall clock
    assert(rows(at(tsStr)) == Set((1L, "a")))
    assert(rows(at(tsStr.replace(' ', 'T'))) == Set((1L, "a"))) // ISO 'T'
    // a date string resolves (local midnight); today's midnight predates
    // both commits, so it must fail LOUDLY as pre-history or resolve v1
    // depending on wall clock — assert only the parse path: a far-future
    // date sees the head, garbage names the forms
    assert(rows(at("9999-12-31")) == Set((1L, "a"), (2L, "b")))
    val e = intercept[IllegalArgumentException] { at("not a time").collect() }
    assert(e.getMessage.contains("yyyy-MM-dd"))
    // an all-digit string past Long range gets the SAME descriptive
    // error, not a raw NumberFormatException
    val e2 = intercept[IllegalArgumentException] {
      at("99999999999999999999").collect()
    }
    assert(e2.getMessage.contains("timestampAsOf") &&
      e2.getMessage.contains("yyyy-MM-dd"))
  }

  test("a DOTTED top-level column name survives the pending-MoR " +
       "relation: required columns and pushed filters are re-quoted, " +
       "not re-parsed as nested paths") {
    val t = fresh("dotted")
    (0L until 8L).map(i => (i, s"n$i")).toDF("user.id", "name")
      .write.format("graft-snapshot").mode("overwrite").save(t)
    Snapshots.eraseMoRCommit(spark, t, "user.id", Seq(2L).toDF("k"))
    val df = spark.read.format("graft-snapshot").load(t)
    assert(df.columns.toSeq == Seq("user.id", "name"))
    // projection + filter both route through buildScan with the raw
    // dotted name — a bare col("user.id") would die resolving `user`.`id`
    assert(df.select(col("`user.id`")).as[Long].collect().toSet ==
      (0L until 8L).toSet - 2L)
    assert(df.filter(col("`user.id`") >= 5).count() == 3)
  }

  test("the write face stays usable on a table with PENDING merge-on-read " +
       "deletes: the commit lands once and save() does not throw on the " +
       "advisory read-back") {
    val t = fresh("wmor")
    Snapshots.commitOverwrite(spark, t,
      (0L until 10L).map(i => (i, s"v$i")).toDF("id", "tag"))
    Snapshots.eraseMoRCommit(spark, t, "id", Seq(3L).toDF("k"))
    val pre = Snapshots.versions(spark, t).size
    // pre-fix this threw AFTER the commit landed (flatScan's MoR
    // rejection on the advisory relation), so a retrying caller would
    // double-append
    Seq((100L, "x")).toDF("id", "tag").write.format("graft-snapshot")
      .mode("append").save(t)
    assert(Snapshots.versions(spark, t).size == pre + 1)
    assert(Snapshots.read(spark, t).select("id").as[Long].collect().toSet ==
      ((0L until 10L).toSet - 3L) + 100L)
    // ignore on an existing MoR table: a true no-op, no throw
    Seq((200L, "y")).toDF("id", "tag").write.format("graft-snapshot")
      .mode("ignore").save(t)
    assert(Snapshots.versions(spark, t).size == pre + 1)
  }

  test("batch write face: SaveMode maps to the format commit — append, " +
       "overwrite, errorIfExists, ignore — with statsCols riding") {
    val t = fresh("write")
    Seq((1L, "a")).toDF("id", "tag").write.format("graft-snapshot")
      .option("statsCols", "id").mode("overwrite").save(t)
    Seq((2L, "b")).toDF("id", "tag").write.format("graft-snapshot")
      .option("statsCols", "id").mode("append").save(t)
    assert(rows(Snapshots.read(spark, t)) == Set((1L, "a"), (2L, "b")))
    assert(Snapshots.versions(spark, t) == Seq(1, 2))
    assert(Snapshots.entries(spark, t).forall(_.stats.contains("id")),
      "statsCols must ride the format writes")
    intercept[IllegalArgumentException] {
      Seq((3L, "c")).toDF("id", "tag").write.format("graft-snapshot")
        .mode("errorIfExists").save(t)
    }
    Seq((3L, "c")).toDF("id", "tag").write.format("graft-snapshot")
      .mode("ignore").save(t) // exists: no-op
    assert(Snapshots.versions(spark, t) == Seq(1, 2))
    // evolve option gates additive evolution like commitAppend's flag
    intercept[IllegalArgumentException] {
      Seq((4L, "d", 1L)).toDF("id", "tag", "score").write
        .format("graft-snapshot").mode("append").save(t)
    }
    Seq((4L, "d", 1L)).toDF("id", "tag", "score").write
      .format("graft-snapshot").option("evolve", "true").mode("append").save(t)
    assert(Snapshots.read(spark, t).columns.toSeq == Seq("id", "tag", "score"))
  }
}
