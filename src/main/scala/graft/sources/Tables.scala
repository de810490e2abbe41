package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch source layer over the driver-generated testdata star schema
  * (TESTDATA.md): one parquet file per table under an `sf` directory.
  *
  * `events.parquet` stores its `ts` as parquet `TIMESTAMP(NANOS)`, which
  * Spark only reads with `spark.sql.legacy.parquet.nanosAsLong=true`
  * (the column then surfaces as `BIGINT` nanos-since-epoch). The conf is
  * dynamic, so we set it defensively on every read — this keeps
  * `SparkEntry.entry`/`queries` correct even under a driver-owned
  * SparkSession we didn't build.
  */
object Tables {
  final val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set(NanosConf, "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** All star-schema table names present in an sf directory. */
  val allNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every table found in `sfDir` as a temp view (missing files
    * are skipped), so `spark.sql` text can query the star schema.
    */
  def registerViews(spark: SparkSession, sfDir: String): Seq[String] =
    allNames.filter { n =>
      val exists = new java.io.File(s"$sfDir/$n.parquet").exists()
      if (exists) table(spark, sfDir, n).createOrReplaceTempView(n)
      exists
    }

  def events(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "events")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
