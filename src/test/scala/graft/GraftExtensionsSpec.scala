package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graftbridge.Bridge

class GraftExtensionsSpec extends SparkTestBase {

  test("extensions inject the TopK planner strategy") {
    val exts = new SparkSessionExtensions
    new GraftExtensions().apply(exts)
    val strategies = Bridge.buildStrategies(exts, spark)
    assert(strategies.contains(graft.plans.TopKStrategy), strategies.toString)
  }

  test("extensions register the vector folds for SQL text") {
    val exts = new SparkSessionExtensions
    new GraftExtensions().apply(exts)
    Bridge.applyExtensionFunctions(exts, spark)
    val r = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
        "sq_l2_dist(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS l").head
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 8.0)
  }

  test("extensions register the URL macros for SQL text, matching the Column API") {
    val exts = new SparkSessionExtensions
    new GraftExtensions().apply(exts)
    Bridge.applyExtensionFunctions(exts, spark)
    val messy = "HTTP://WWW.Example.COM:80//a//b/?b=2&a=1&utm_source=f#frag"
    val r = spark.sql(
      s"SELECT canonicalize_url('$messy') AS c, url_domain('$messy') AS d").head
    assert(r.getString(0) == "http://example.com/a/b?a=1&b=2")
    assert(r.getString(1) == "example.com")
    // same tree as the Column API — identical output by construction
    import org.apache.spark.sql.functions.{col, lit}
    val viaColumn = spark.range(1)
      .select(graft.operators.UrlOps.canonicalizeUrl(lit(messy)).as("c"))
      .head.getString(0)
    assert(r.getString(0) == viaColumn)
  }

  test("extensions register normalize_text and nfc_normalize for SQL text") {
    val exts = new SparkSessionExtensions
    new GraftExtensions().apply(exts)
    Bridge.applyExtensionFunctions(exts, spark)
    // decomposed A+ring, NBSP, BEL, double space -- spelled as \uXXXX
    // escapes INSIDE the SQL literal (Spark's parser decodes them; SQL
    // char() would be wrong here -- it is mod-256 ASCII, so char(778)
    // yields a newline, not the combining ring)
    val r = spark.sql(
      "SELECT normalize_text('A\\u030A\\u00A0\\u0007b  c ') AS n, " +
      "nfc_normalize('A\\u030A') AS c").head
    assert(r.getString(0) == "\u00C5 b c")
    assert(r.getString(1) == "\u00C5")
    // macro expands to the same tree as the Column API
    import org.apache.spark.sql.functions.lit
    val viaColumn = spark.range(1)
      .select(graft.operators.TextAnalysis.normalizeText(
        lit("A\u030A\u00A0\u0007b  c ")).as("n"))
      .head.getString(0)
    assert(r.getString(0) == viaColumn)
  }

  test("extensions register rolling_hash for SQL text, matching the JVM impl") {
    val exts = new SparkSessionExtensions
    new GraftExtensions().apply(exts)
    Bridge.applyExtensionFunctions(exts, spark)
    val got = spark.sql("SELECT rolling_hash('abc') AS h").head.getLong(0)
    val want = graft.functions.RollingHash.hashBytes(
      "abc".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(got == want)
  }
}
