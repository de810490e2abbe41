package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table helpers: pre-shuffle a table ONCE at write time so every
  * subsequent equi-join/aggregation on the bucket key runs exchange-free.
  *
  * This is the 100 TB answer to repeated fact-fact joins: a 100 TB
  * lineitem joined to orders on every query either shuffles 100 TB per
  * query or is bucketed by `l_orderkey` once. Bucket counts should match
  * (or divide) across co-joined tables; `sortBy` additionally makes the
  * merge side sort-free.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    var w = df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    w.saveAsTable(table)
  }
}
