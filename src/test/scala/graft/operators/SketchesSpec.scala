package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SketchesSpec extends SparkTestBase {

  private def eventsDf = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")

  test("approx distinct per group lands within the HLL error bound of exact") {
    val approx = Sketches.approxDistinctByGroup(eventsDf, "event_type", "user_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = eventsDf.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      val ap = approx(k).toDouble
      assert(math.abs(ap - ex) / ex <= 0.15,
        s"$k: approx $ap vs exact $ex exceeds 3x rsd")
    }
  }

  test("approxDistinctAudit emits exact counts and an all-true bound flag") {
    val out = Sketches.approxDistinctAudit(eventsDf, "event_type", "user_id")
      .collect()
    val exact = eventsDf.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("d"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.length == exact.size)
    out.foreach { r =>
      val (d, n) = exact(r.getString(0))
      assert(r.getLong(1) == d && r.getLong(2) == n)
      assert(r.getBoolean(3), s"${r.getString(0)}: approx outside the bound")
    }
  }

  test("count-min estimates are never below exact, and close at this scale") {
    val exact = eventsDf.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val est = Sketches.cmsEstimates(eventsDf, "event_type",
      exact.keys.toSeq, eps = 0.001, confidence = 0.99)
    exact.foreach { case (k, ex) =>
      assert(est(k) >= ex, s"$k: CMS must never underestimate ($ex vs ${est(k)})")
      assert(est(k) <= ex + math.ceil(0.001 * n).toLong * 3,
        s"$k: CMS estimate ${est(k)} too far above exact $ex")
    }
  }

  test("bloom prefilter preserves join results while shrinking the big side") {
    val s = spark
    import s.implicits._
    val big = spark.range(50000L).select(col("id").as("k"), (col("id") * 3).as("v"))
    val small = spark.range(100L).select((col("id") * 250).as("k"))
    val filtered = Sketches.bloomPrefilter(big, "k", small, "k",
      expectedItems = 100L, fpp = 0.01)
    val survived = filtered.count()
    assert(survived < 5000L, s"bloom should drop almost all of 50k rows, kept $survived")
    val exactJoin = big.join(small, "k").orderBy("k").collect().toSeq
    val prefiltered = filtered.join(small, "k").orderBy("k").collect().toSeq
    assert(prefiltered == exactJoin, "false positives must wash out in the join")
  }
}
