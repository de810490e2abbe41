package graft.runtime

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** CLI-path encoding immunity (VERDICT r10 task 3): `--input` parquet
  * written with a writer-chosen physical ts encoding must reach the
  * transform chain as the engine's one logical event-time type — BIGINT
  * epoch nanos — exactly like the query surface's `Tables` boundary.
  */
class PipelineRunnerSpec extends SparkTestBase {

  private val tsUs = Seq(1700000000000000L, 1700000123456789L, 1700086400000000L)

  private def writeInput(encode: org.apache.spark.sql.Column): String = {
    val dir = java.nio.file.Files.createTempDirectory("plr_in").toString + "/events.parquet"
    val rows = tsUs.zipWithIndex.map { case (us, i) =>
      Row(i.toLong, us, s"""{"k":$i,"keep":"v$i"}""")
    }
    df(StructType(Seq(
      StructField("event_id", LongType), StructField("ts_us", LongType),
      StructField("props", StringType))), rows: _*)
      .withColumn("ts", encode).drop("ts_us")
      .select("event_id", "ts", "props")
      .coalesce(1).write.parquet(dir)
    dir
  }

  private val chainProps = Map(
    "transforms" -> "dropK",
    "transforms.dropK.type" -> "DropField$Value",
    "transforms.dropK.column" -> "props",
    "transforms.dropK.fields" -> "k")

  test("--input with instant TIMESTAMP ts is normalized to BIGINT nanos through the chain") {
    val in = writeInput(timestamp_micros(col("ts_us")))
    val out = PipelineRunner.run(spark, in, None, chainProps)
    assert(out.schema("ts").dataType == LongType)
    val got = out.orderBy("event_id")
      .collect().map(r => (r.getAs[Long]("ts"), r.getAs[String]("props"))).toSeq
    assert(got.map(_._1) == tsUs.map(_ * 1000L))
    // the chain actually ran on the normalized frame
    assert(got.map(_._2) == Seq("""{"keep":"v0"}""", """{"keep":"v1"}""", """{"keep":"v2"}"""))
  }

  test("--input with TIMESTAMP_NTZ ts normalizes identically (UTC wall clock)") {
    val in = writeInput(timestamp_micros(col("ts_us")).cast(TimestampNTZType))
    val out = PipelineRunner.run(spark, in, None, chainProps)
    assert(out.schema("ts").dataType == LongType)
    assert(out.orderBy("event_id").collect().map(_.getAs[Long]("ts")).toSeq
      == tsUs.map(_ * 1000L))
  }

  test("--input without a ts column passes through untouched") {
    val dir = java.nio.file.Files.createTempDirectory("plr_nots").toString + "/in.parquet"
    df(StructType(Seq(StructField("id", LongType), StructField("props", StringType))),
      Row(1L, """{"k":1,"keep":"x"}"""))
      .write.parquet(dir)
    val out = PipelineRunner.run(spark, dir, None, chainProps)
    assert(out.columns.toSeq == Seq("id", "props"))
    assert(out.head.getString(1) == """{"keep":"x"}""")
  }
}
