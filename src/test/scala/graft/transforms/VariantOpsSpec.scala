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
