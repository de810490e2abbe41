package graft.transforms

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.model.Envelope

/** Ports of the reference's 3 StructuredSchemalessToJsonString tests
  * (`StructuredSchemalessToJsonStringTest.java:24-59`, FIXTURES.md §A5).
  */
class StructuredToJsonStringSpec extends SparkTestBase {

  test("schemaless primitive passes through (StructuredSchemalessToJsonStringTest.java:24-33)") {
    val in = envelopeDf(IntegerType, StringType, 42, "v")
    val out = StructuredToJsonString.key(in)
    assert(out.schema == in.schema)
    assert(out.select("key").head().getInt(0) == 42)
  }

  test("schemaless map serializes to JSON string (StructuredSchemalessToJsonStringTest.java:36-44)") {
    val in = envelopeDf(MapType(StringType, IntegerType), StringType,
      Map("id" -> 42), "v")
    val out = StructuredToJsonString.key(in)
    assert(out.schema(Envelope.KeyCol).dataType == StringType)
    assert(out.select("key").head().getString(0) == """{"id":42}""")
  }

  test("schema-ful struct passes through unchanged (StructuredSchemalessToJsonStringTest.java:47-59)") {
    val st = StructType(Seq(StructField("id", IntegerType)))
    val in = envelopeDf(st, StringType, Row(42), "v")
    val out = StructuredToJsonString.key(in)
    assert(out.schema == in.schema)
    assert(out.select("key").head().getStruct(0).getInt(0) == 42)
    // engine extension: opt-in struct serialization
    val ext = StructuredToJsonString(Envelope.KeyCol, includeStructs = true)(in)
    assert(ext.select("key").head().getString(0) == """{"id":42}""")
  }
}
