package graft.transforms

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class VariantOpsSpec extends SparkTestBase {

  test("parse + typed extraction, nested paths, lenient missing fields") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, """{"a":{"b":7},"s":"x","n":1.5}"""))
      .toDF("id", "j")
    val v = VariantOps.withVariant(df, "j", "v")
    val r = v.select(
      VariantOps.extract(col("v"), "$.a.b", "bigint").as("ab"),
      VariantOps.extract(col("v"), "$.s", "string").as("s"),
      VariantOps.extract(col("v"), "$.n", "double").as("n"),
      VariantOps.extractLenient(col("v"), "$.zzz", "bigint").as("zzz")).head()
    assert(r.getLong(0) == 7L && r.getString(1) == "x" && r.getDouble(2) == 1.5)
    assert(r.isNullAt(3))
  }

  test("dropField removes top-level and nested paths, leaves siblings untouched") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, """{"a":{"b":7,"c":[1,2]},"k":3,"z":"keep"}""")).toDF("id", "j")
    val v = VariantOps.withVariant(df, "j", "v")
    def js(c: org.apache.spark.sql.Column): String = v.select(to_json(c)).head().getString(0)
    assert(js(VariantOps.dropField(col("v"), Seq("k"))) ==
      """{"a":{"b":7,"c":[1,2]},"z":"keep"}""")
    assert(js(VariantOps.dropField(col("v"), Seq("a", "b"))) ==
      """{"a":{"c":[1,2]},"k":3,"z":"keep"}""")
    // missing leaf under an existing parent: no-op
    assert(js(VariantOps.dropField(col("v"), Seq("a", "missing"))) ==
      """{"a":{"b":7,"c":[1,2]},"k":3,"z":"keep"}""")
  }

  test("hoist wraps the payload, honoring keep-in-root and the empty-inner rule") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, """{"id":9,"t":"x","u":4}""")).toDF("id", "j")
    val v = VariantOps.withVariant(df, "j", "v")
    def js(c: org.apache.spark.sql.Column): String = v.select(to_json(c)).head().getString(0)
    assert(js(VariantOps.hoist(col("v"), "wrapped", Seq("id"))) ==
      """{"id":9,"wrapped":{"t":"x","u":4}}""")
    // empty keep-list wraps the whole object
    assert(js(VariantOps.hoist(col("v"), "w")) ==
      """{"w":{"id":9,"t":"x","u":4}}""")
    // everything kept in root → no inner field at all (reference rule)
    assert(js(VariantOps.hoist(col("v"), "w", Seq("id", "t", "u"))) ==
      """{"id":9,"t":"x","u":4}""")
    // empty keep-list wraps even a SCALAR variant
    val scalar = Seq((1L, "5")).toDF("id", "j")
    assert(VariantOps.withVariant(scalar, "j", "v")
      .select(to_json(VariantOps.hoist(col("v"), "w"))).head().getString(0) ==
      """{"w":5}""")
  }

  test("lenient parse nulls malformed JSON; strict parse throws") {
    val s = spark
    import s.implicits._
    val bad = Seq((1L, "{not json")).toDF("id", "j")
    assert(VariantOps.withVariant(bad, "j", "v", lenient = true)
      .select(col("v")).head().isNullAt(0))
    intercept[Exception] {
      VariantOps.withVariant(bad, "j", "v").select(col("v")).collect()
    }
  }
}
