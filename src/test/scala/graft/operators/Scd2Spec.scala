package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class Scd2Spec extends SparkTestBase {

  // history rows: (id, lang, valid_from, valid_to)
  private def hist(rows: (Long, String, Long, Option[Long])*) = {
    val s = spark
    import s.implicits._
    rows.map { case (id, l, f, t) => (id, l, f, t.map(Long.box).orNull) }
      .toDF("id", "lang", "valid_from", "valid_to")
      .select(col("id"), col("lang"), col("valid_from"),
        col("valid_to").cast("long"))
  }

  // change rows: (id, lang, ts, op)
  private def run(history: org.apache.spark.sql.DataFrame,
                  changes: (Long, String, Long, String)*) = {
    val s = spark
    import s.implicits._
    Scd2.applyHistory(history,
        changes.toDF("id", "lang", "ts", "op"), Seq("id"), "ts", Some("op"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toSet
  }

  test("bootstrap from empty history; intervals chain and last version stays open") {
    val out = run(hist(),
      (1L, "a", 10L, "u"), (1L, "b", 20L, "u"), (2L, "x", 5L, "u"))
    assert(out == Set(
      (1L, "a", 10L, Some(20L)), (1L, "b", 20L, None), (2L, "x", 5L, None)))
  }

  test("no-op updates and re-delivered versions collapse: idempotent apply") {
    val h = hist((1L, "a", 10L, None))
    val once = run(h, (1L, "a", 15L, "u"), (1L, "b", 20L, "u"),
      (1L, "b", 20L, "u"))
    assert(once == Set((1L, "a", 10L, Some(20L)), (1L, "b", 20L, None)))
    // re-apply the same batch onto the produced history: no change
    val s = spark
    import s.implicits._
    val produced = Seq((1L, "a", 10L, Some(20L)), (1L, "b", 20L, None))
      .map { case (id, l, f, t) => (id, l, f, t.map(Long.box).orNull) }
      .toDF("id", "lang", "valid_from", "valid_to")
      .select(col("id"), col("lang"), col("valid_from"), col("valid_to").cast("long"))
    assert(run(produced, (1L, "a", 15L, "u"), (1L, "b", 20L, "u")) == once)
  }

  test("out-of-order change splices into the timeline and re-closes its predecessor") {
    val h = hist((1L, "a", 10L, Some(30L)), (1L, "c", 30L, None))
    assert(run(h, (1L, "b", 20L, "u")) == Set(
      (1L, "a", 10L, Some(20L)), (1L, "b", 20L, Some(30L)),
      (1L, "c", 30L, None)))
  }

  test("delete closes the timeline; later upsert re-opens; gaps survive rebuild") {
    val h = hist((1L, "a", 10L, None))
    val closed = run(h, (1L, "a", 20L, "d"))
    assert(closed == Set((1L, "a", 10L, Some(20L))))
    // re-open after the tombstone: the [20,40) gap must survive
    val s = spark
    import s.implicits._
    val closedDf = Seq((1L, "a", 10L, 20L))
      .toDF("id", "lang", "valid_from", "valid_to")
    assert(run(closedDf, (1L, "b", 40L, "u")) == Set(
      (1L, "a", 10L, Some(20L)), (1L, "b", 40L, None)))
    // and a pure rebuild (empty batch) round-trips the closed tail
    assert(run(closedDf) == Set((1L, "a", 10L, Some(20L))))
  }

  test("equal-ts close/open collision resolves to the upsert; contiguous history round-trips") {
    val h = hist((1L, "a", 10L, Some(20L)), (1L, "b", 20L, None))
    assert(run(h) == Set((1L, "a", 10L, Some(20L)), (1L, "b", 20L, None)))
    // conflicting upserts at one ts: deterministic survivor, no zero-length row
    val out = run(hist(), (1L, "a", 10L, "u"), (1L, "z", 10L, "u"),
      (1L, "m", 20L, "u"))
    assert(out == Set((1L, "z", 10L, Some(20L)), (1L, "m", 20L, None)))
  }

  test("snapshotAt covers [valid_from, valid_to) with the open tail current") {
    val h = hist((1L, "a", 10L, Some(20L)), (1L, "b", 20L, None),
      (2L, "x", 5L, Some(8L)))
    def snap(ts: Long): Set[(Long, String)] =
      Scd2.snapshotAt(h, "valid_from", "valid_to", ts)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(snap(5L) == Set((2L, "x"))) // key 1 not yet opened
    assert(snap(15L) == Set((1L, "a"))) // key 2 closed at 8
    assert(snap(19L) == Set((1L, "a"))) // valid_to exclusive
    assert(snap(20L) == Set((1L, "b"))) // boundary flips to successor
    assert(snap(999L) == Set((1L, "b"))) // open tail is current forever
  }

  test("enrichAsOf equals the brute interval-cover join; gaps and pre-history -> NULL") {
    val s = spark
    import s.implicits._
    // key 1: [10,20) a, [20,30) b, GAP [30,40), [40,∞) c ; key 2: [5,8) x
    val h = hist((1L, "a", 10L, Some(20L)), (1L, "b", 20L, Some(30L)),
      (1L, "c", 40L, None), (2L, "x", 5L, Some(8L)))
    // facts hit: pre-history, each interval, both boundaries (valid_from
    // inclusive, valid_to exclusive), the gap, the open tail, a dead key
    val facts = Seq((1L, 9L), (1L, 10L), (1L, 15L), (1L, 20L), (1L, 29L),
      (1L, 30L), (1L, 39L), (1L, 40L), (1L, 999L), (2L, 8L), (2L, 7L))
      .toDF("id", "fact_ts")
    val got = Scd2.enrichAsOf(facts, h, Seq("id"), "fact_ts")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSet
    // brute force: LEFT interval-cover join
    val brute = facts.as("f").join(h.as("h"),
        $"f.id" === $"h.id" && $"h.valid_from" <= $"f.fact_ts" &&
          ($"h.valid_to".isNull || $"h.valid_to" > $"f.fact_ts"), "left")
      .select($"f.id", $"f.fact_ts", $"h.lang", $"h.valid_from", $"h.valid_to")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSet
    assert(got == brute)
    // spot-pin the semantics the equivalence rides on
    assert(got.contains((1L, 9L, None, None, None)))              // pre-history
    assert(got.contains((1L, 10L, Some("a"), Some(10L), Some(20L)))) // from incl.
    assert(got.contains((1L, 30L, None, None, None)))             // gap start
    assert(got.contains((1L, 39L, None, None, None)))             // gap end
    assert(got.contains((1L, 40L, Some("c"), Some(40L), None)))   // re-open
    assert(got.contains((2L, 8L, None, None, None)))              // to excl.
    // cardinality-preserving: one output row per fact row
    assert(Scd2.enrichAsOf(facts, h, Seq("id"), "fact_ts").count()
      == facts.count())
  }

  test("one exchange, one sort: both window passes share the shuffle and ordering") {
    val s = spark
    import s.implicits._
    val h = hist((1L, "a", 10L, None), (2L, "x", 5L, Some(8L)))
    val out = Scd2.applyHistory(h,
      Seq((1L, "b", 20L, "u")).toDF("id", "lang", "ts", "op"),
      Seq("id"), "ts", Some("op"))
    out.collect()
    // finalized AQE section only (the echoed initial plan double-counts)
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    val sorts = plan.linesIterator.count(_.trim.matches("^[+:\\-*() 0-9]*Sort \\[.*"))
    assert(exchanges == 1, s"expected 1 key exchange, got $exchanges:\n$plan")
    assert(sorts == 1, s"expected the two windows to reuse one sort, got $sorts:\n$plan")
  }
}
