package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SkewSpec extends SparkTestBase {

  test("salted aggregate equals direct aggregate on a skewed key set") {
    val s = spark
    import s.implicits._
    // 10k rows on one hot key + a long tail
    val df = ((1 to 10000).map(i => ("hot", i.toDouble)) ++
      (1 to 100).map(i => (s"k$i", i.toDouble))).toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .orderBy("k").collect().toSeq
    val salted = Skew.saltedAggregate(df, Seq("k"), 16,
      partialAggs = Seq(count(lit(1)).as("n"), sum($"v").as("s")),
      mergeAggs = Seq(sum($"n").as("n"), sum($"s").as("s")))
      .orderBy("k").collect().toSeq
    assert(salted == direct)
  }

  test("stage-1 actually spreads the hot key across salt buckets") {
    val s = spark
    import s.implicits._
    val df = (1 to 5000).map(i => ("hot", 1L)).toDF("k", "v")
    val salted = df.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(16)))
    val buckets = salted.groupBy("__salt").count().count()
    assert(buckets > 8, s"expected the hot key spread over many salt buckets, got $buckets")
  }
}
