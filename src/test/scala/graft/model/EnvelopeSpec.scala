package graft.model

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.transforms.DropField

/** The Kafka-envelope contract: a transform rewrites ONLY the targeted
  * key/value column; topic/partition/timestamp/headers pass through
  * untouched (deliberately diverging from the reference's DropField,
  * which loses headers via the 7-arg newRecord — DropField.java:151).
  */
class EnvelopeSpec extends SparkTestBase {

  test("kafka-shaped records keep their full envelope through a value transform") {
    val valueType = StructType(Seq(
      StructField("id", LongType),
      StructField("meta", StructType(Seq(
        StructField("keep", StringType),
        StructField("drop_me", StringType))))))
    val schema = Envelope.schema(StringType, valueType)
    val rows = Seq(
      Row("events", 3, "k1", Row(1L, Row("a", "x")), 1704067200000L,
        Seq(Row("h1", "v1".getBytes), Row("h2", "v2".getBytes))),
      Row("events", 7, "k2", Row(2L, Row("b", "y")), 1704067201000L, Seq()))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)

    val out = DropField("value", Seq("meta.drop_me"))(df)
      .orderBy("partition").collect()

    // envelope intact
    assert(out.map(_.getAs[String]("topic")).toSeq == Seq("events", "events"))
    assert(out.map(_.getAs[Int]("partition")).toSeq == Seq(3, 7))
    assert(out.map(_.getAs[String]("key")).toSeq == Seq("k1", "k2"))
    assert(out.map(_.getAs[Long]("timestamp")).toSeq ==
      Seq(1704067200000L, 1704067201000L))
    val headers = out.head.getAs[scala.collection.Seq[Row]]("headers")
    assert(headers.map(_.getString(0)) == Seq("h1", "h2"),
      "headers must survive (unlike the reference's DropField)")
    // value transformed: drop_me gone, keep present
    val v = out.head.getAs[Row]("value")
    assert(v.getAs[Row]("meta").schema.fieldNames.toSeq == Seq("keep"))
    assert(v.getAs[Row]("meta").getString(0) == "a")
  }
}
