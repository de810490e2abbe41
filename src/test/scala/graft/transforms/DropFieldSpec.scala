package graft.transforms

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkTestBase
import graft.model.Envelope

/** Ports of the reference's 4 DropField tests (`DropFieldTest.java:26-161`,
  * fixture map FIXTURES.md §A1-A2) plus engine-specific edge cases.
  */
class DropFieldSpec extends SparkTestBase {

  // DropFieldTest.java:28-37 — k1 INT32, parent.child.k2 STRING
  private val valueType = StructType(Seq(
    StructField("k1", IntegerType),
    StructField("parent", StructType(Seq(
      StructField("child", StructType(Seq(
        StructField("k2", StringType)))))))))
  private val valueRow = Row(123, Row(Row("123")))

  private def input = envelopeDf(StringType, valueType, "key0", valueRow)

  test("with schema: drop nested leaf leaves empty child struct (DropFieldTest.java:56-64)") {
    val out = DropField.value(Seq("parent.child.k2"))(input)
    val vt = out.schema(Envelope.ValueCol).dataType.asInstanceOf[StructType]
    assert(vt.fieldNames.toSeq == Seq("k1", "parent"))
    val child = vt("parent").dataType.asInstanceOf[StructType]("child").dataType
      .asInstanceOf[StructType]
    assert(child.fields.isEmpty, "child must become an EMPTY struct, not disappear")
    val row = out.select("value").head()
    assert(row.getStruct(0).getInt(0) == 123)
    assert(row.getStruct(0).getStruct(1).getStruct(0).length == 0)
  }

  test("with schema: drop struct path removes whole subtree (DropFieldTest.java:97-103)") {
    val out = DropField.value(Seq("parent.child"))(input)
    val vt = out.schema(Envelope.ValueCol).dataType.asInstanceOf[StructType]
    val parent = vt("parent").dataType.asInstanceOf[StructType]
    assert(parent.fields.isEmpty, "parent must become empty after dropping child subtree")
    assert(out.select("value.k1").head().getInt(0) == 123)
  }

  test("schemaless: drop nested leaf (DropFieldTest.java:117-127)") {
    val in = envelopeDf(StringType, StringType,
      "key0", """{"k1":123,"parent":{"child":{"k2":"123"}}}""")
    val out = DropField.value(Seq("parent.child.k2"))(in)
    assert(out.select("value").head().getString(0) ==
      """{"k1":123,"parent":{"child":{}}}""")
  }

  test("schemaless: drop subtree (DropFieldTest.java:150-161)") {
    val in = envelopeDf(StringType, StringType,
      "key0", """{"k1":123,"parent":{"child":{"k2":"123"}}}""")
    val out = DropField.value(Seq("parent.child"))(in)
    assert(out.select("value").head().getString(0) == """{"k1":123,"parent":{}}""")
  }

  test("null value passes through (DropField.java:45-46)") {
    val out = DropField.value(Seq("parent.child"))(
      envelopeDf(StringType, valueType, "key0", null))
    assert(out.select("value").head().isNullAt(0))
    val outJson = DropField.value(Seq("k1"))(
      envelopeDf(StringType, StringType, "key0", null))
    assert(outJson.select("value").head().isNullAt(0))
  }

  test("nonexistent path is identity; empty fields list is identity (DropField.java:27-28)") {
    val out = DropField.value(Seq("no.such.path", "alsoMissing"))(input)
    assert(out.select("value").head() == input.select("value").head())
    assert(DropField.value(Nil)(input).schema == input.schema)
  }

  test("schemaless non-object datum throws, mirroring requireMap (DropField.java:56)") {
    val in = envelopeDf(StringType, StringType, "key0", "42")
    val ex = intercept[Exception] {
      DropField.value(Seq("k1"))(in).collect()
    }
    assert(ex.getMessage != null)
  }

  test("key targeting: DropField$Key rewrites key, not value (DropField.java:137-152)") {
    val in = envelopeDf(valueType, StringType, valueRow, "v")
    val out = DropField.key(Seq("parent"))(in)
    val kt = out.schema(Envelope.KeyCol).dataType.asInstanceOf[StructType]
    assert(kt.fieldNames.toSeq == Seq("k1"))
    assert(out.select("value").head().getString(0) == "v")
  }

  test("envelope fidelity: topic/partition/timestamp/headers survive (fixes DropField.java:151)") {
    val out = DropField.value(Seq("parent.child"))(input)
    val r = out.select("topic", "partition", "timestamp").head()
    assert(r.getString(0) == "test" && r.getInt(1) == 0 && r.getLong(2) == 1700000000000L)
    assert(out.select("headers").head().getSeq[Row](0).head.getString(0) == "h1")
  }

  // ---- SURVEY §2.3 item 1: a config path splits on '.' unconditionally
  // (DropField.java:72-75), so a field LITERALLY NAMED "a.b" is
  // unaddressable and must never be confused with nesting. Property-
  // tested for random segment names on BOTH the struct and JSON paths.

  private def scCheck(n: Int)(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  private val segGen: Gen[String] = for {
    len <- Gen.chooseNum(1, 5)
    cs <- Gen.listOfN(len, Gen.alphaLowerChar)
  } yield cs.mkString

  // filter `a` BEFORE the flatMap: testing `a != "zz"` inside the inner
  // suchThat makes the predicate unsatisfiable whenever the outer draw IS
  // "zz", exhausting ScalaCheck's retries into a rare flaky Gave-up
  private val twoSegs: Gen[(String, String)] =
    segGen.suchThat(_ != "zz").flatMap(a =>
      segGen.suchThat(b => b != a && b != "zz").map(b => (a, b)))

  test("property: path always splits on '.' — parsePath never yields a dotted segment") {
    scCheck(50)(Prop.forAll(Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, segGen))) {
      segs =>
        val parsed = NestedOps.parsePath(segs.mkString("."))
        parsed == segs && parsed.forall(!_.contains('.'))
    })
  }

  test("property: struct path — dropping 'a.b' hits nested a→b, never a literal 'a.b' field") {
    scCheck(8)(Prop.forAll(twoSegs) { case (s1, s2) =>
      val vt = StructType(Seq(
        StructField(s"$s1.$s2", IntegerType), // literal dotted name
        StructField(s1, StructType(Seq(
          StructField(s2, IntegerType), StructField("zz", IntegerType))))))
      val in = envelopeDf(StringType, vt, "key0", Row(11, Row(22, 33)))
      val out = DropField.value(Seq(s"$s1.$s2"))(in)
      val ot = out.schema(Envelope.ValueCol).dataType.asInstanceOf[StructType]
      val nested = ot(s1).dataType.asInstanceOf[StructType]
      val row = out.select("value").head().getStruct(0)
      ot.fieldNames.toSeq == Seq(s"$s1.$s2", s1) && // literal field survives
        nested.fieldNames.toSeq == Seq("zz") &&     // nested s2 dropped
        row.getInt(0) == 11 && row.getStruct(1).getInt(0) == 33
    })
  }

  test("property: JSON path — dropping 'a.b' hits nested a→b, never a literal 'a.b' key") {
    scCheck(8)(Prop.forAll(twoSegs) { case (s1, s2) =>
      val json = s"""{"$s1.$s2":11,"$s1":{"$s2":22,"zz":33}}"""
      val in = envelopeDf(StringType, StringType, "key0", json)
      val out = DropField.value(Seq(s"$s1.$s2"))(in)
      // Jackson preserves key order: literal key intact, nested s2 gone
      out.select("value").head().getString(0) ==
        s"""{"$s1.$s2":11,"$s1":{"zz":33}}"""
    })
  }

  test("null nested struct propagates null (defined sanely vs reference NPE, SURVEY §2.3.3)") {
    val in = envelopeDf(StringType, valueType, "key0", Row(7, null))
    val out = DropField.value(Seq("parent.child.k2"))(in)
    val v = out.select("value").head().getStruct(0)
    assert(v.getInt(0) == 7)
    assert(v.isNullAt(1), "null parent struct must stay null, not become struct(null)")
  }
}
