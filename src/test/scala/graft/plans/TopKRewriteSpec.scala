package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TopKRewriteSpec extends SparkTestBase {

  private def custDf = graft.sources.Tables.customer(spark, "/root/testdata/sf0.001")

  private def windowTopK = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    custDf.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
      .select("c_mktsegment", "c_custkey", "c_acctbal", "rank")
  }

  private def withRule[T](body: => T): T = {
    val exp = spark.experimental
    val savedOpt = exp.extraOptimizations
    val savedStrat = exp.extraStrategies
    exp.extraOptimizations = savedOpt :+ TopKRewrite
    if (!savedStrat.contains(TopKStrategy))
      exp.extraStrategies = savedStrat :+ TopKStrategy
    try body finally {
      exp.extraOptimizations = savedOpt
      exp.extraStrategies = savedStrat
    }
  }

  test("row_number<=k window filter rewrites to TopKPerKeyExec, results unchanged") {
    val want = windowTopK.orderBy("c_mktsegment", "rank").collect().toSeq
    withRule {
      val df = windowTopK
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey"), s"rewrite should fire:\n$plan")
      assert(!plan.contains("Window ") && !plan.toLowerCase.contains("windowexec"),
        s"window operator should be gone:\n$plan")
      val got = df.orderBy("c_mktsegment", "rank").collect().toSeq
      assert(got == want)
    }
  }

  test("long-literal bound (rank <= 3L) rewrites too, through the coercion cast") {
    val want = windowTopK.orderBy("c_mktsegment", "rank").collect().toSeq
    withRule {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      // the long literal makes type coercion wrap rank in cast(... as bigint)
      val df = custDf.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= lit(3L))
        .select("c_mktsegment", "c_custkey", "c_acctbal", "rank")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey"), s"rewrite should fire on a long bound:\n$plan")
      assert(df.orderBy("c_mktsegment", "rank").collect().toSeq == want)
    }
  }

  test("extra conjuncts survive as a residual filter") {
    withRule {
      val df = windowTopK.filter(col("c_acctbal") > 0)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey"), plan)
      val want = windowTopK.filter(col("c_acctbal") > 0)
        .orderBy("c_mktsegment", "rank").collect().toSeq
      assert(df.orderBy("c_mktsegment", "rank").collect().toSeq == want)
    }
  }

  test("global (un-partitioned) top-k keeps the window plan and still runs") {
    withRule {
      val w = Window.orderBy(col("c_acctbal").desc, col("c_custkey"))
      val df = custDf.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3).select("c_custkey", "rank")
      // TopKPerKeyExec requires a non-empty clustering — the rule must
      // leave this shape alone instead of producing an unplannable node
      assert(!df.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      assert(df.collect().length == 3)
    }
  }

  test("does not fire for rank(), large k, or non-rank filters") {
    withRule {
      // rank() is not row_number(): ties share ranks, heap semantics differ
      val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal").desc)
      val rankDf = custDf.withColumn("r", rank().over(w)).filter(col("r") <= 3)
      assert(!rankDf.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      // k beyond the guard keeps the spillable window plan
      spark.conf.set("spark.graft.topkRewrite.maxK", "2")
      try {
        val big = windowTopK
        assert(!big.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      } finally spark.conf.unset("spark.graft.topkRewrite.maxK")
    }
  }
}
