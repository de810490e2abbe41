package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, hash, lit, pmod}

/** Output-layout control: hive-style partitioned parquet, the read-side
  * complement of [[Bucketing]]. A predicate on the partition column prunes
  * whole directories at planning time (`PartitionFilters` in the scan, no
  * footer even opened) — on a 100 TB table partitioned by day, a one-day
  * query reads ~1/365th of the data before any row-level work.
  *
  * `filesPerPartition` repartitions by the partition columns first so each
  * directory gets few, large files instead of one file per input task —
  * the small-files problem is the other half of layout at scale.
  */
object Layout {

  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       filesPerPartition: Int = 1): Unit = {
    require(partitionCols.nonEmpty, "partitionCols must not be empty")
    // file-split salt = hash of the whole row, NOT spark_partition_id():
    // a row-content hash spreads rows regardless of incoming partition
    // count (a 1-partition input would make partition_id constant and the
    // parameter a no-op) and is deterministic under task retry
    // (repartitioning on a nondeterministic key risks row loss on
    // shuffle-retry, SPARK-23207)
    val arranged =
      if (filesPerPartition == 1) df.repartition(partitionCols.map(col): _*)
      else df.repartition(
        partitionCols.map(col) :+
          pmod(hash(df.columns.map(col): _*), lit(filesPerPartition)): _*)
    arranged.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Bin-pack a parquet directory's small files — the table-maintenance
    * pass every long-lived dataset needs after many small appends
    * (streaming micro-batches, partition-scoped merges): each file costs
    * a task, an open, and a footer read, so a 100 TB table fragmented
    * into 10⁷ tiny files is slow before any row is touched.
    *
    * Sizing comes from the Hadoop FS listing (driver-side, bounded by
    * file count — the thing being fixed is that this count is too high);
    * the data moves through ONE round-robin repartition to
    * `ceil(bytes / targetFileBytes)` output files — no key semantics, so
    * no skew concern. The rewrite goes to a sibling temp dir first, then
    * swaps by renaming the original ASIDE (`.compact-old`), renaming the
    * temp dir into place, and only then deleting the old copy — a reader
    * never observes a half-compacted directory, the no-directory window
    * is a single rename (not a full recursive delete), and a crash
    * anywhere in the swap leaves a complete copy of the data on disk
    * (in `.compact-old` and/or `.compact-tmp`, recoverable by rename).
    * The swap is not transactional — concurrent readers racing the one
    * rename window need table-format-level atomicity this plain-directory
    * layout cannot provide. Returns the output file count.
    */
  def compactSmallFiles(spark: SparkSession, path: String,
                        targetFileBytes: Long): Int = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statuses = fs.listStatus(hPath)
    // refuse hive-partitioned roots: the top level has only partition
    // subdirectories, so the size scan below would see 0 bytes and the
    // rewrite would read the WHOLE table and emit it UNPARTITIONED —
    // silently flattening the layout. Compact each partition directory.
    val partDirs = statuses.filter(_.isDirectory).map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith("."))
    require(partDirs.isEmpty,
      s"compactSmallFiles compacts one FLAT parquet directory; $path has " +
        s"partition subdirectories (${partDirs.take(3).mkString(", ")}...) " +
        "— call it per partition directory instead")
    val files = statuses
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    require(files.nonEmpty, s"no parquet data files directly under $path")
    val bytes = files.map(_.getLen).sum
    val n = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(path + ".compact-tmp")
    val old = new org.apache.hadoop.fs.Path(path + ".compact-old")
    fs.delete(tmp, true)
    fs.delete(old, true)
    spark.read.parquet(path).repartition(n)
      .write.mode("overwrite").parquet(tmp.toString)
    // swap: original aside -> tmp into place -> drop the old copy. The
    // original is never deleted before the replacement is in place, so a
    // crash at any step leaves a complete copy on disk; the table path is
    // absent only between the two renames.
    require(fs.rename(hPath, old), s"rename $hPath -> $old failed")
    if (!fs.rename(tmp, hPath)) {
      // restore the original before failing: the compacted copy stays in
      // tmp for inspection, the table keeps serving its old files. If the
      // restore ALSO fails, say where the data actually lives — a message
      // claiming "restored" when it wasn't would misdirect recovery.
      if (fs.rename(old, hPath))
        sys.error(s"rename $tmp -> $hPath failed; original restored")
      else
        sys.error(s"rename $tmp -> $hPath failed AND restore $old -> " +
          s"$hPath failed: table path is empty; original data is in $old, " +
          s"compacted copy in $tmp — restore manually")
    }
    fs.delete(old, true)
    n
  }

  /** Z-ordered parquet layout: range-partition + sort by the Morton code
    * of two dimension columns, so each output file (and row group) covers
    * a tight rectangle in (colA, colB) space — predicates on EITHER
    * column prune via parquet min/max stats, where a plain sort serves
    * only its leading column. `repartitionByRange` samples the z-values
    * to balance files; the sort is partition-local (no global sort).
    */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    numFiles: Int = 8, bits: Int = 16): Unit = {
    val withZ = df.withColumn("__z",
      graft.functions.ZOrder.zValue(col(colA), col(colB), bits))
    withZ.repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Hilbert-ordered parquet layout — same shape as [[writeZOrdered]]
    * (range-partition + partition-local sort on the curve index, no
    * global sort) but on the Hilbert index: because the Hilbert curve
    * takes unit steps only, ANY contiguous index range — in particular
    * each output file, whose boundaries fall wherever
    * `repartitionByRange`'s size balancing puts them, NOT on
    * power-of-two tiles — stays a compact blob in (colA, colB) space,
    * so per-file min/max envelopes are tighter than Z-order's at
    * unaligned splits and box predicates prune more files
    * (`HilbertSpec` pins the envelope-area win deterministically).
    */
  def writeHilbertOrdered(df: DataFrame, path: String, colA: String,
                          colB: String, numFiles: Int = 8,
                          bits: Int = 16): Unit = {
    val withH = df.withColumn("__h",
      graft.functions.Hilbert.hilbert_index(col(colA), col(colB), bits))
    withH.repartitionByRange(numFiles, col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")
      .write.mode("overwrite").parquet(path)
  }
}
