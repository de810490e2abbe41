package graft.model

import org.apache.spark.sql.types._

/** Canonical Kafka-style record envelope.
  *
  * Mirrors the reference's `ConnectRecord` envelope (see
  * `/root/reference/.../DropField.java:151` `newRecord(topic, partition,
  * keySchema, key, valueSchema, value, timestamp)` plus headers in
  * `ExtendedHoistField.java:193`) and Spark's own Kafka source schema
  * (`key BINARY, value BINARY, topic STRING, partition INT, offset LONG,
  * timestamp TIMESTAMP, headers ARRAY<STRUCT<key STRING, value BINARY>>`).
  *
  * Unlike the reference — whose `DropField` silently drops headers (7-arg
  * `newRecord`, `DropField.java:151`) while the other two transforms keep
  * them — every transform in this engine preserves the whole envelope:
  * a transform only ever rewrites the `key` or `value` column, so
  * topic/partition/timestamp/headers survive by construction.
  */
object Envelope {
  val TopicCol = "topic"
  val PartitionCol = "partition"
  val KeyCol = "key"
  val ValueCol = "value"
  val TimestampCol = "timestamp"
  val HeadersCol = "headers"

  /** `ARRAY<STRUCT<key STRING, value BINARY>>` — same shape Spark's Kafka
    * source emits for record headers.
    */
  val headersType: ArrayType = ArrayType(
    StructType(Seq(
      StructField("key", StringType),
      StructField("value", BinaryType))),
    containsNull = false)

  /** Envelope schema with caller-chosen key/value payload types. */
  def schema(keyType: DataType, valueType: DataType): StructType = StructType(Seq(
    StructField(TopicCol, StringType, nullable = false),
    StructField(PartitionCol, IntegerType, nullable = false),
    StructField(KeyCol, keyType, nullable = true),
    StructField(ValueCol, valueType, nullable = true),
    StructField(TimestampCol, LongType, nullable = true),
    StructField(HeadersCol, headersType, nullable = true)))
}
