package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The runtime half of the skew story (SkewSpec covers salted
  * aggregation): joins don't need hand-salting because AQE's skew-join
  * splitting re-plans hot partitions at runtime. This spec proves the
  * engine's config path actually triggers it — a join with one hot key
  * executes with `skew=true` sub-partitions instead of one straggler task.
  */
class SkewJoinSpec extends SparkTestBase {

  test("AQE splits the hot partition of a skewed sort-merge join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // force a shuffle join and make the thresholds small enough that the
      // hot key's partition counts as skewed at test scale
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      // 400k rows, 80% on key 0; right side is uniform
      val left = spark.range(400000L).select(
        when(col("id") % 5 =!= 0, col("id") % 1000).otherwise(0L).as("k"),
        col("id").as("payload"))
      val right = spark.range(1000L).select(col("id").as("k"), (col("id") * 7).as("rv"))
      // action on THIS Dataset's queryExecution — count() would build a
      // separate plan and leave this one un-finalized (isFinalPlan=false)
      val joined = left.join(right, "k").select(count(lit(1)).as("n"))
      assert(joined.collect().head.getLong(0) == 400000L)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE should mark the hot partition as skewed:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
