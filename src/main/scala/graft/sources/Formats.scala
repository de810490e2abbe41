package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Multi-format batch sources/sinks beyond parquet: CSV and JSON-lines —
  * the two interchange formats every ingestion pipeline meets before data
  * is columnarized.
  *
  * Ground rules at scale, encoded here rather than left to callers:
  *  - ALWAYS read with an explicit schema. Inference is an extra full
  *    scan before the real one (2× the 100 TB read) and can silently
  *    change dtypes between runs as data drifts.
  *  - Both formats as written here are splittable (uncompressed, one
  *    record per line), so a 1000-executor cluster parallelizes the scan
  *    by byte ranges; gzip would serialize each file to one task.
  *  - These are row formats: no column pruning, no predicate pushdown, no
  *    min/max skipping. They are the LANDING format — convert to parquet
  *    once, query forever; never run the analytics tier off CSV.
  *
  * Numeric fidelity: Spark writes doubles via shortest-round-trip
  * rendering (Java `Double.toString` semantics), so a
  * write→read round trip through either text format reproduces the exact
  * binary64 values — asserted in `FormatsSpec`.
  */
object Formats {

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC — the other columnar warehouse format. Unlike the text formats
    * it embeds its schema and statistics, so reads are self-describing
    * and get column pruning + predicate pushdown like parquet.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Parquet read across SCHEMA DRIFT: a long-lived 100 TB table is
    * written by many pipeline versions, and "a new writer added a
    * column" must not strand the old files. `mergeSchema` unions every
    * file's schema at planning time; rows from pre-evolution files
    * surface the added columns as NULL, and column pruning still reaches
    * each file with its own subset.
    *
    * Scale note — why Spark leaves this OFF by default and so do we for
    * the star tables: merging is an O(files) footer read before the scan
    * (a distributed job, but real planning latency on a million-file
    * table). Use it at evolution boundaries, then compact/rewrite to the
    * current schema; steady-state reads should carry one schema.
    */
  def readParquetMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)
}
