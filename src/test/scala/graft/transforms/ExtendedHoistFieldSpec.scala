package graft.transforms

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.model.Envelope

/** Ports of the reference's 9 ExtendedHoistField tests
  * (`ExtendedHoistFieldTest.java:41-211`, fixture map FIXTURES.md §A3-A4).
  * The reference exercises the Key variant throughout (`SinkRecord` key
  * side, `ExtendedHoistFieldTest.java:34`); so do we.
  */
class ExtendedHoistFieldSpec extends SparkTestBase {

  // A4 schema: shouldBeMoved INT nullable, keepInRoot INT, keepInRoot2 INT
  private val keyType = StructType(Seq(
    StructField("shouldBeMoved", IntegerType, nullable = true),
    StructField("keepInRoot", IntegerType),
    StructField("keepInRoot2", IntegerType)))
  private val keep = Seq("keepInRoot", "keepInRoot2")

  test("schemaless: plain wrap of a bare primitive (ExtendedHoistFieldTest.java:41-50)") {
    val in = envelopeDf(StringType, StringType, "42", "v")
    val out = ExtendedHoistField.key("magic")(in)
    assert(out.select("key").head().getString(0) == """{"magic":42}""")
  }

  test("schemaless: keep-in-root partitioning (ExtendedHoistFieldTest.java:53-72)") {
    val in = envelopeDf(StringType, StringType,
      """{"shouldBeMoved":42,"keepInRoot":111,"keepInRoot2":112}""", "v")
    val out = ExtendedHoistField.key("magic", keep)(in)
    assert(out.select("key").head().getString(0) ==
      """{"keepInRoot":111,"keepInRoot2":112,"magic":{"shouldBeMoved":42}}""")
  }

  test("schemaless: everything kept leaves record unchanged, no inner key (ExtendedHoistFieldTest.java:75-91)") {
    val in = envelopeDf(StringType, StringType,
      """{"keepInRoot":111,"keepInRoot2":112}""", "v")
    val out = ExtendedHoistField.key("magic", keep)(in)
    assert(out.select("key").head().getString(0) ==
      """{"keepInRoot":111,"keepInRoot2":112}""")
  }

  test("schemaless: empty inner map is omitted (ExtendedHoistFieldTest.java:94-111)") {
    val in = envelopeDf(StringType, StringType, """{"keepInRoot":111}""", "v")
    val out = ExtendedHoistField.key("magic", keep)(in)
    assert(out.select("key").head().getString(0) == """{"keepInRoot":111}""")
  }

  test("with schema: partition into root + inner struct (ExtendedHoistFieldTest.java:114-136)") {
    val in = envelopeDf(keyType, StringType, Row(42, 111, 112), "v")
    val out = ExtendedHoistField.key("magic", keep)(in)
    val kt = out.schema(Envelope.KeyCol).dataType.asInstanceOf[StructType]
    assert(kt.fieldNames.toSeq == Seq("keepInRoot", "keepInRoot2", "magic"))
    val k = out.select("key").head().getStruct(0)
    assert(k.getInt(0) == 111 && k.getInt(1) == 112)
    assert(k.getStruct(2).getInt(0) == 42)
  }

  test("with schema: everything kept ⇒ schema has no inner field (ExtendedHoistFieldTest.java:139-158)") {
    val allKeptType = StructType(Seq(
      StructField("keepInRoot", IntegerType), StructField("keepInRoot2", IntegerType)))
    val in = envelopeDf(allKeptType, StringType, Row(111, 112), "v")
    val out = ExtendedHoistField.key("magic", keep)(in)
    val kt = out.schema(Envelope.KeyCol).dataType.asInstanceOf[StructType]
    assert(!kt.fieldNames.contains("magic"), "no magic field when nothing moves")
    assert(out.select("key").head().getStruct(0) == Row(111, 112))
  }

  test("with schema: all movable fields null ⇒ inner struct is null (ExtendedHoistFieldTest.java:161-182)") {
    val in = envelopeDf(keyType, StringType, Row(null, 111, 112), "v")
    val out = ExtendedHoistField.key("magic", keep)(in)
    val k = out.select("key").head().getStruct(0)
    assert(k.getInt(0) == 111 && k.getInt(1) == 112)
    assert(k.isNullAt(2),
      "magic must be null when every movable field is null (Connect omitted the value)")
  }

  test("with schema: non-struct value wraps whole datum (ExtendedHoistFieldTest.java:185-194)") {
    val in = envelopeDf(IntegerType, StringType, 42, "v")
    val out = ExtendedHoistField.key("magic")(in)
    val kt = out.schema(Envelope.KeyCol).dataType.asInstanceOf[StructType]
    assert(kt.fieldNames.toSeq == Seq("magic"))
    assert(out.select("key").head().getStruct(0).getInt(0) == 42)
  }

  test("schemaless: non-object with keep-list throws (ExtendedHoistField.java:51-60); envelope preserved") {
    val bad = envelopeDf(StringType, StringType, "42", "v")
    val ex = intercept[Exception] {
      ExtendedHoistField.key("magic", keep)(bad).collect()
    }
    assert(ex.getMessage != null)
    // envelope fidelity (replaces the reference's Java-map mutability test
    // ExtendedHoistFieldTest.java:197-211 — meaningless on immutable rows)
    val in = envelopeDf(keyType, StringType, Row(42, 111, 112), "v")
    val out = ExtendedHoistField.key("magic", keep)(in)
    val r = out.select("topic", "partition", "timestamp", "value").head()
    assert(r.getString(0) == "test" && r.getInt(1) == 0 &&
      r.getLong(2) == 1700000000000L && r.getString(3) == "v")
  }

  test("missing required field config throws (ExtendedHoistField.java:42-43)") {
    val ex = intercept[IllegalArgumentException] {
      ExtendedHoistField(Envelope.KeyCol, "")
    }
    assert(ex.getMessage.contains("field"))
  }
}
