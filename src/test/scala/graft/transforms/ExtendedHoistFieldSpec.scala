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

  // ---- dotted-name property tests, the HOIST mirror of DropFieldSpec's:
  // keepInRootFieldNames entries are exact NAME matches, never paths
  // (`ExtendedHoistField.java:107-123` compares names with equals), so a
  // keep entry "a.b" DOES match a literal root field named "a.b" and
  // does NOT reach into nesting — the opposite of DropField's
  // split-on-'.' paths. Locked for random segment names on both modes.

  private val segGen: org.scalacheck.Gen[String] = for {
    len <- org.scalacheck.Gen.chooseNum(1, 5)
    cs <- org.scalacheck.Gen.listOfN(len, org.scalacheck.Gen.alphaLowerChar)
  } yield cs.mkString

  private val twoSegs: org.scalacheck.Gen[(String, String)] =
    segGen.flatMap(a => segGen.suchThat(b => b != a && a != "w" && b != "w")
      .map(b => (a, b)))

  private def scCheck(n: Int)(prop: org.scalacheck.Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default
        .withMinSuccessfulTests(n).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: struct keep — 'a.b' keeps the literal 'a.b' field, nested a.b moves whole") {
    scCheck(8)(org.scalacheck.Prop.forAll(twoSegs) { case (s1, s2) =>
      val kt = StructType(Seq(
        StructField(s"$s1.$s2", IntegerType), // literal dotted name
        StructField(s1, StructType(Seq(StructField(s2, IntegerType))))))
      val in = envelopeDf(kt, StringType, Row(11, Row(22)), "v")
      val out = ExtendedHoistField.key("w", Seq(s"$s1.$s2"))(in)
      val ot = out.schema(Envelope.KeyCol).dataType.asInstanceOf[StructType]
      val inner = ot("w").dataType.asInstanceOf[StructType]
      val row = out.select("key").head().getStruct(0)
      // literal dotted field stays at root; the s1 STRUCT (with its
      // nested s2 intact) moves under w
      ot.fieldNames.toSeq == Seq(s"$s1.$s2", "w") &&
        inner.fieldNames.toSeq == Seq(s1) &&
        inner(s1).dataType.asInstanceOf[StructType].fieldNames.toSeq == Seq(s2) &&
        row.getInt(0) == 11 &&
        row.getStruct(1).getStruct(0).getInt(0) == 22
    })
  }

  test("property: JSON keep — 'a.b' keeps the literal 'a.b' key, nested object moves whole") {
    scCheck(8)(org.scalacheck.Prop.forAll(twoSegs) { case (s1, s2) =>
      val json = s"""{"$s1.$s2":11,"$s1":{"$s2":22}}"""
      val in = envelopeDf(StringType, StringType, json, "v")
      val out = ExtendedHoistField.key("w", Seq(s"$s1.$s2"))(in)
      out.select("key").head().getString(0) ==
        s"""{"$s1.$s2":11,"w":{"$s1":{"$s2":22}}}"""
    })
  }
}
