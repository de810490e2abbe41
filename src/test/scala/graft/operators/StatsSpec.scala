package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class StatsSpec extends SparkTestBase {

  private def kv = {
    val s = spark
    import s.implicits._
    // key "a": values 1..10; key "b": constant 7 ×4
    ((1L to 10L).map(v => ("a", v)) ++ Seq.fill(4)(("b", 7L)))
      .toDF("k", "v")
  }

  test("discreteQuantilesByKey returns existing elements at the right index") {
    val got = Stats.discreteQuantilesByKey(kv, "k", "v",
      Seq("p0" -> 0.0, "p50" -> 0.5, "p100" -> 1.0))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // n=10: idx floor(9*0.5)=4 → sorted(1..10)(4) = 5; min/max exact
    assert(got("a") == ((1L, 5L, 10L)))
    assert(got("b") == ((7L, 7L, 7L)), "constant group: every quantile is 7")
  }

  test("histogram clamps overflow into the last bucket and counts all rows") {
    val s = spark
    import s.implicits._
    val df = Seq(0L, 5L, 10L, 15L, 99L, 1000L).toDF("x")
    val got = Stats.histogram(df, "x", width = 10L, nBuckets = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 2L, 1L -> 2L, 3L -> 2L),
      s"99 and 1000 both clamp into bucket 3, got $got")
    assert(got.values.sum == 6L)
    // negative values clamp into bucket 0 — no phantom negative buckets,
    // and no dependence on truncate-vs-floor integer division
    val neg = Stats.histogram(Seq(-5L, -15L, 3L).toDF("x"), "x", 10L, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(neg == Map(0L -> 3L), s"negatives must clamp to bucket 0, got $neg")
  }

  test("discreteQuantilesByKey ignores NULL values (standard semantics)") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", Some(1L)), ("a", None), ("a", Some(3L)), ("a", Some(2L)))
      .toDF("k", "v")
    val got = Stats.discreteQuantilesByKey(df, "k", "v",
      Seq("p0" -> 0.0, "p100" -> 1.0)).collect().head
    assert(got.getLong(1) == 1L && got.getLong(2) == 3L,
      "quantiles computed over the 3 non-null values only")
  }

  test("globalOrdinals equals the global-window rank, stays multi-partition") {
    val s = spark
    import s.implicits._
    // shuffled insertion order — ordinals must follow key order, not
    // arrival order
    val rows = scala.util.Random.shuffle((0L until 500L).toList)
      .map(i => (i, s"p$i"))
    val df = rows.toDF("id", "payload").repartition(7)
    val out = Stats.globalOrdinals(df, "id", partitions = 5)
    assert(out.rdd.getNumPartitions == 5, "no single-partition funnel")
    val got = out.select("id", "ordinal").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L until 500L).map(i => i -> i).toMap,
      "ordinal == rank by id, contiguous from 0")
    // deterministic across invocations
    val again = Stats.globalOrdinals(df, "id", partitions = 5)
      .select("id", "ordinal").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == got)
  }

  test("filterFunnel stages are monotonically non-increasing and cumulative") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val toks = TextAnalysis.tokenCountWs(col("text"))
    val got = TextAnalysis.filterFunnel(docs, Seq(
      "len" -> toks.between(20, 90),
      "all" -> lit(true),
      "none" -> lit(false)))
      .orderBy("stage_idx").collect()
    val counts = got.map(_.getAs[Long]("n_pass"))
    assert(got.map(_.getAs[String]("stage")).toSeq ==
      Seq("total", "len", "all", "none"))
    assert(counts.sliding(2).forall(w => w(0) >= w(1)), "funnel never grows")
    assert(counts(1) == counts(2), "always-true rule keeps the count")
    assert(counts(3) == 0L, "always-false rule ends the funnel at 0")
    assert(counts(0) == docs.count())
    // rule names with quotes must survive the SQL splice
    val quoted = TextAnalysis.filterFunnel(docs,
      Seq("tok's ratio" -> lit(true))).orderBy("stage_idx").collect()
    assert(quoted.map(_.getAs[String]("stage")).toSeq ==
      Seq("total", "tok's ratio"))
  }

  test("weightedSample: weight 1 keeps all, 0 keeps none, is deterministic") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"))
    val all = Sampling.weightedSample(
      docs.withColumn("w", lit(1.0)), "doc_id", "w").count()
    val none = Sampling.weightedSample(
      docs.withColumn("w", lit(0.0)), "doc_id", "w").count()
    assert(all == docs.count() && none == 0L)
    // half-weight ≈ half kept, and the kept set equals stratifiedSample's
    // constant-fraction set (same hash, same threshold arithmetic family)
    val half = Sampling.weightedSample(
      docs.withColumn("w", lit(0.5)), "doc_id", "w")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(math.abs(half.size.toDouble / docs.count() - 0.5) < 0.1)
    val again = Sampling.weightedSample(
      docs.withColumn("w", lit(0.5)), "doc_id", "w")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(half == again, "same weights → same kept set")
  }

  test("rankCalibrate: per-group per-mille ranks, skew-immune cutoffs") {
    val s = spark
    import s.implicits._
    // source A scores 10x higher than source B everywhere — a global
    // raw cutoff would keep ONLY A; calibrated ranks treat them alike
    val df = (
      (1L to 5L).map(i => (i, "A", i * 100L)) ++
      (11L to 15L).map(i => (i, "B", (i - 10) * 10L)) :+
      ((99L, "C", 7L))).toDF("id", "src", "score")
    val cal = Stats.rankCalibrate(df, "src", "score", "id")
    val pm = cal.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // 5-member groups: ranks 0, 250, 500, 750, 1000 (desc score)
    assert(pm(5L) === 0L && pm(4L) === 250L && pm(1L) === 1000L)
    assert(pm(15L) === 0L && pm(11L) === 1000L)
    assert(pm(99L) === 0L, "singleton group calibrates to 0")
    // top-quarter cutoff keeps the best of EACH source
    val kept = cal.filter(col("rank_pm") <= 250).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(5L, 4L, 15L, 14L, 99L))
    intercept[IllegalArgumentException] {
      Stats.rankCalibrate(df.withColumn("rank_pm", lit(1)), "src", "score", "id")
    }
  }
}
