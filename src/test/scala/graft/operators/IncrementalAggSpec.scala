package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class IncrementalAggSpec extends SparkTestBase {

  // facts: (k, v); MV: per-k (sum_v, n)
  private def facts(rows: (String, Long)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("k", "sum_v")
  }

  private def mv(f: org.apache.spark.sql.DataFrame) =
    f.groupBy("k").agg(sum("sum_v").as("sum_v"), count(lit(1)).as("n"))

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("update + delete + new-group insert: incremental equals recompute") {
    val base = facts(("a", 10L), ("a", 20L), ("b", 5L), ("c", 7L))
    // a:10 -> 15 (update), b:5 deleted, d:9 inserted (new group)
    val delta = IncrementalAgg.retractionDelta(
      facts(("a", 10L), ("b", 5L)),            // retract old
      facts(("a", 15L), ("d", 9L)),            // add new
      Seq("k"), Seq("sum_v"), "n")
    val got = collect(IncrementalAgg.applyDelta(mv(base), delta,
      Seq("k"), Seq("sum_v"), "n"))
    val recomputed = collect(mv(facts(("a", 15L), ("a", 20L), ("c", 7L), ("d", 9L))))
    assert(got == recomputed && got ==
      Set(("a", 35L, 2L), ("c", 7L, 1L), ("d", 9L, 1L)))
  }

  test("a fully-retracted group VANISHES instead of lingering at zero") {
    val base = facts(("a", 10L), ("b", 5L))
    val delta = IncrementalAgg.retractionDelta(
      facts(("b", 5L)), facts(), Seq("k"), Seq("sum_v"), "n")
    val got = collect(IncrementalAgg.applyDelta(mv(base), delta,
      Seq("k"), Seq("sum_v"), "n"))
    assert(got == Set(("a", 10L, 1L)), s"zero-count group must vanish: $got")
    // and re-inserting afterwards starts the group fresh, not poisoned
    val delta2 = IncrementalAgg.retractionDelta(
      facts(), facts(("b", 3L)), Seq("k"), Seq("sum_v"), "n")
    val again = collect(IncrementalAgg.applyDelta(
      IncrementalAgg.applyDelta(mv(base), delta, Seq("k"), Seq("sum_v"), "n"),
      delta2, Seq("k"), Seq("sum_v"), "n"))
    assert(again == Set(("a", 10L, 1L), ("b", 3L, 1L)))
  }

  test("one key exchange, partial aggregation on both sides") {
    val base = facts(("a", 10L), ("b", 5L))
    val delta = IncrementalAgg.retractionDelta(
      facts(("a", 10L)), facts(("a", 12L)), Seq("k"), Seq("sum_v"), "n")
    val out = IncrementalAgg.applyDelta(mv(base), delta, Seq("k"), Seq("sum_v"), "n")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the merge itself is ONE exchange; the toy mv()/delta inputs add
    // their own upstream aggs, so count only exchanges keyed on the MV key
    val exchanges = plan.linesIterator
      .count(l => l.contains("Exchange hashpartitioning") && l.contains("k#"))
    assert(exchanges <= 3, s"unexpected exchange count $exchanges:\n$plan")
    assert(plan.contains("partial_sum") || plan.contains("Partial"),
      s"expected map-side partial aggregation:\n$plan")
    intercept[IllegalArgumentException] {
      IncrementalAgg.applyDelta(mv(base), delta, Seq("k"), Seq("k"), "n")
    }
  }
}
