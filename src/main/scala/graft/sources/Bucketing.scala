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

  /** `path` makes the table EXTERNAL at that location (data outlives the
    * in-memory catalog and can be cleaned up by the caller); without it
    * the data lands in the session's warehouse directory.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int, sortCols: Seq[String] = Nil,
                    path: Option[String] = None): Unit = {
    var w = df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    path.foreach(p => w = w.option("path", p))
    w.saveAsTable(table)
  }
}
