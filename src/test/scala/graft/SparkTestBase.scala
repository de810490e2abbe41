package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Envelope

/** One shared local SparkSession for the whole test JVM. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_warehouse").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  def df(schema: StructType, rows: Row*): DataFrame =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)

  /** One-record envelope DataFrame, like the reference tests'
    * `new SourceRecord("test", 0, keySchema, key, valueSchema, value)`.
    */
  def envelopeDf(keyType: org.apache.spark.sql.types.DataType,
                 valueType: org.apache.spark.sql.types.DataType,
                 key: Any, value: Any): DataFrame = {
    val headers = Seq(Row("h1", "hv".getBytes("UTF-8")))
    df(Envelope.schema(keyType, valueType),
      Row("test", 0, key, value, 1700000000000L, headers))
  }
}
