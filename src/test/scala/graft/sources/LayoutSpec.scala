package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class LayoutSpec extends SparkTestBase {

  test("partitioned write prunes directories at planning time") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_layout").toString
    val df = spark.range(10000L).select(
      (col("id") % 7).as("day"), col("id").as("v"))
    Layout.writePartitioned(df, dir, Seq("day"))
    // one directory per partition value
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("day=")).sorted
    assert(dirs.length == 7, dirs.mkString(","))

    val q = Layout.readPartitioned(spark, dir).filter(col("day") === 3)
    assert(q.count() == 10000L / 7 + (if (3 < 10000 % 7) 1 else 0))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("day"),
      s"partition predicate must prune at the scan:\n$plan")
    // the data filter must NOT appear as a post-scan Filter on day — the
    // pruning happens before row-level work
    assert(!plan.contains("PushedFilters: [IsNotNull(day)"),
      s"day is a partition column, not a data column:\n$plan")
  }

  test("driver query q_partition_prune prunes at the scan and matches a plain filter") {
    val sf = "/root/testdata/sf0.001"
    val df = graft.SparkEntry.queries("q_partition_prune")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"),
      s"partition predicate must prune at the scan:\n$plan")
    val want = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("round-trip preserves data across the partition split") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_layout_rt").toString
    val df = Seq((0L, "a"), (1L, "b"), (0L, "c")).toDF("p", "s")
    Layout.writePartitioned(df, dir, Seq("p"))
    // note: partition values come back type-INFERRED from the directory
    // names (p=0 → int), so cast for a stable comparison
    val back = Layout.readPartitioned(spark, dir)
      .select(col("p").cast("long"), col("s")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back == Set((0L, "a"), (1L, "b"), (0L, "c")))
  }

  test("compactSmallFiles bin-packs a fragmented directory losslessly and atomically-by-rename") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("compact").toString + "/t"
    // 64 tiny files of ~identical size
    s.range(10000L).select(col("id"), (col("id") * 3).as("v"))
      .repartition(64).write.parquet(dir)
    def parquetFiles = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(parquetFiles.length == 64)
    val before = s.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val totalBytes = parquetFiles.map(_.length).sum
    // target a quarter of the data per file → ~4 output files
    val n = Layout.compactSmallFiles(s, dir, targetFileBytes = totalBytes / 4)
    assert(n >= 4 && n <= 5, s"expected ~4 output files, planned $n")
    assert(parquetFiles.length == n,
      s"directory must hold exactly the planned $n files, got ${parquetFiles.length}")
    assert(!new java.io.File(dir + ".compact-tmp").exists(),
      "temp dir must be renamed away, not left behind")
    assert(!new java.io.File(dir + ".compact-old").exists(),
      "the set-aside original must be deleted after the swap")
    val after = s.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == before, "compaction must be lossless")
  }

  test("compactSmallFiles refuses a hive-partitioned root instead of flattening it") {
    val s = spark
    val dir = Files.createTempDirectory("compact_part").toString + "/t"
    Layout.writePartitioned(
      s.range(100L).select(col("id"), (col("id") % 3).cast("int").as("p")),
      dir, Seq("p"))
    val ex = intercept[IllegalArgumentException] {
      Layout.compactSmallFiles(s, dir, targetFileBytes = 1L << 20)
    }
    assert(ex.getMessage.contains("partition subdirectories"),
      s"unexpected message: ${ex.getMessage}")
    // the layout must be untouched by the refusal
    assert(s.read.parquet(dir).where(col("p") === 1).count() > 0)
  }
}
