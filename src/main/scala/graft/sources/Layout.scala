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
}
