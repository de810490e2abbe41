package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TopKPerKeySpec extends SparkTestBase {

  private def custDf = graft.sources.Tables.customer(spark, "/root/testdata/sf0.001")

  test("topKPerKey output equals window row_number <= k exactly") {
    val viaCustom = TopKPerKey.topKPerKey(custDf, Seq("c_mktsegment"),
      Seq("c_acctbal" -> false, "c_custkey" -> true), 3)
      .select("c_mktsegment", "c_custkey", "c_acctbal", "rank")
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val viaWindow = custDf.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("c_mktsegment", "c_custkey", "c_acctbal", "rank")
    val a = viaCustom.orderBy("c_mktsegment", "rank").collect().toSeq
    val b = viaWindow.orderBy("c_mktsegment", "rank").collect().toSeq
    assert(a == b)
  }

  test("physical plan uses TopKPerKeyExec with a single hash exchange, no sort") {
    val df = TopKPerKey.topKPerKey(custDf, Seq("c_mktsegment"),
      Seq("c_acctbal" -> false, "c_custkey" -> true), 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan) // exec node prints without "Exec"
    assert(!plan.toLowerCase.contains("sortexec") && !plan.contains("+- Sort "),
      s"no full sort expected:\n$plan")
  }

  test("k larger than group size returns whole groups ranked") {
    val s = spark
    import s.implicits._
    val tiny = Seq(("a", 1), ("a", 2), ("b", 5)).toDF("k", "v")
    val got = TopKPerKey.topKPerKey(tiny, Seq("k"), Seq("v" -> false), 10)
      .orderBy("k", "rank").collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    assert(got.toSeq == Seq(("a", 2, 1), ("a", 1, 2), ("b", 5, 1)))
  }

  test("high key cardinality: 100k distinct keys stay correct (documented memory regime)") {
    val s = spark
    import s.implicits._
    // 100k keys × 3 rows each; k=2. Exercises the O(keys × k) heap-map
    // bound end-to-end and the streaming output path (no partition-level
    // output buffer). Correctness checked against the window formulation.
    val n = 300000L
    val df = spark.range(n).select(
      (col("id") % 100000).as("k"),
      (col("id") * 2654435761L % 1000003L).as("v"),
      col("id"))
    val viaCustom = TopKPerKey.topKPerKey(df, Seq("k"), Seq("v" -> false, "id" -> true), 2)
    assert(viaCustom.count() == 200000L, "2 rows per key for 100k keys")
    val w = Window.partitionBy(col("k")).orderBy(col("v").desc, col("id"))
    val viaWindow = df.withColumn("rank", row_number().over(w)).filter(col("rank") <= 2)
    val sample = viaCustom.filter(col("k") < 50)
      .orderBy("k", "rank").collect().toSeq
    val expected = viaWindow.filter(col("k") < 50)
      .orderBy("k", "rank").collect().toSeq
    assert(sample == expected)
  }

  test("ties broken by the secondary sort column deterministically") {
    val s = spark
    import s.implicits._
    val tied = Seq(("a", 5, 2L), ("a", 5, 1L), ("a", 5, 3L)).toDF("k", "v", "id")
    val got = TopKPerKey.topKPerKey(tied, Seq("k"),
      Seq("v" -> false, "id" -> true), 2)
      .orderBy("rank").collect().map(r => (r.getLong(2), r.getInt(3)))
    assert(got.toSeq == Seq((1L, 1), (2L, 2)))
  }
}
