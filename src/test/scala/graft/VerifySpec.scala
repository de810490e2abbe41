package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The correctness dump must be LOUD about failures (VERDICT r9): a query
  * that throws yields an entry in the returned failure map (persisted as
  * `failed.json` by `main`), never just a missing output dir.
  */
class VerifySpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("verify_spec").toString

  test("runQueries writes healthy results and returns empty failure map") {
    val out = tmp()
    val qs = Map[String, (SparkSession, String) => DataFrame](
      "ok" -> ((s, _) => { import s.implicits._; Seq(1, 2, 3).toDF("x") }))
    val failed = Verify.runQueries(spark, qs, "/unused", out)
    assert(failed.isEmpty)
    assert(spark.read.parquet(s"$out/ok").count() == 3)
  }

  test("a throwing query lands in the failure map with its message, and " +
       "does not stop the remaining queries") {
    val out = tmp()
    val qs = Map[String, (SparkSession, String) => DataFrame](
      "boom" -> ((_, _) => throw new IllegalStateException(
        "tiny\nplan line that must not survive")),
      "ok" -> ((s, _) => { import s.implicits._; Seq(42).toDF("x") }))
    val failed = Verify.runQueries(spark, qs, "/unused", out)
    assert(failed.keySet == Set("boom"))
    assert(failed("boom").contains("IllegalStateException"))
    assert(failed("boom").contains("tiny"))
    // the good query still ran
    assert(spark.read.parquet(s"$out/ok").head.getInt(0) == 42)
  }

  test("failure json is valid and escapes control characters") {
    val json = Verify.jsonObject(Map("q" -> "line1\nline2\t\"quoted\""))
    assert(json == "{\"q\": \"line1\\nline2\\t\\\"quoted\\\"\"}")
    assert(Verify.jsonObject(Map.empty) == "{}")
  }
}
