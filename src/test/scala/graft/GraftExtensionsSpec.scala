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
