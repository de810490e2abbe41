package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class RangeJoinSpec extends SparkTestBase {

  test("point-in-interval matches exactly, including bin-boundary cases") {
    val s = spark
    import s.implicits._
    val points = Seq((1L, 0L, "p0"), (1L, 10L, "p10"), (1L, 99L, "p99"),
      (1L, 100L, "p100"), (2L, 10L, "o10"))
      .toDF("k", "ts", "name")
    // intervals: [5,15] (contains 10), [99,101] (spans a bin edge at 100
    // with binWidth=100 — must still catch both 99 and 100), [200,210]
    val intervals = Seq((1L, 5L, 15L), (1L, 99L, 101L), (1L, 200L, 210L))
      .toDF("k", "start", "end")
    val got = RangeJoin.pointInInterval(points, intervals,
      Seq("k"), "ts", "start", "end", binWidth = 100L)
      .select("name", "start").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("p10", 5L), ("p99", 99L), ("p100", 99L)))
  }

  test("equals the naive inequality-join formulation") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(3)
    val points = (0 until 300).map(i => (i % 7L, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "ts", "pid")
    val intervals = (0 until 60).map { i =>
      val st = rnd.nextInt(1000).toLong
      (i % 7L, st, st + rnd.nextInt(120).toLong)
    }.toDF("k", "start", "end")
    val viaBins = RangeJoin.pointInInterval(points, intervals,
      Seq("k"), "ts", "start", "end", binWidth = 64L)
      .select("pid", "start", "end").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaNaive = points.as("p").join(intervals.as("i"),
      col("p.k") === col("i.k") && col("p.ts") >= col("i.start") &&
        col("p.ts") <= col("i.end"))
      .select("pid", "start", "end").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaBins == viaNaive)
  }

  test("plans as an equi-join (shuffle join on key+bin), not nested-loop") {
    val s = spark
    import s.implicits._
    val points = Seq((1L, 10L)).toDF("k", "ts")
    val intervals = Seq((1L, 5L, 15L)).toDF("k", "start", "end")
    val p = RangeJoin.pointInInterval(points, intervals,
      Seq("k"), "ts", "start", "end", binWidth = 100L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join must not plan as a product:\n$p")
  }
}
