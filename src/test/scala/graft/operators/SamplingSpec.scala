package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SamplingSpec extends SparkTestBase {

  private def docsDf = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")

  test("deterministicSplit covers every row and lands near the weights") {
    val split = Sampling.deterministicSplit(docsDf, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val total = docsDf.count().toDouble
    val byName = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName.values.sum.toDouble == total, "every row gets a split")
    assert(byName("train") / total > 0.7 && byName("train") / total < 0.9,
      s"train share ${byName("train") / total} should be ≈0.8")
    assert(byName.contains("val") && byName.contains("test"))
  }

  test("split is deterministic and independent of which other rows exist") {
    val full = Sampling.deterministicSplit(docsDf, "doc_id",
      Seq("a" -> 0.5, "b" -> 0.5))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // splitting a SUBSET must give each row the same assignment — the
    // property that prevents train/test leakage across dataset versions
    val subset = Sampling.deterministicSplit(
      docsDf.filter(col("doc_id") % 3 === 0), "doc_id",
      Seq("a" -> 0.5, "b" -> 0.5))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(subset.forall { case (id, s) => full(id) == s })
  }

  test("stratifiedSample keeps per-stratum fractions, deterministically") {
    val s1 = Sampling.stratifiedSample(docsDf, "doc_id", "lang",
      Map("en" -> 1.0), defaultFraction = 0.0)
    val langs = s1.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs == Set("en"), s"fraction-1 stratum only, got $langs")
    assert(s1.count() == docsDf.filter(col("lang") === "en").count())
    val s2 = Sampling.stratifiedSample(docsDf, "doc_id", "lang",
      Map("en" -> 0.5), defaultFraction = 0.1)
    val again = Sampling.stratifiedSample(docsDf, "doc_id", "lang",
      Map("en" -> 0.5), defaultFraction = 0.1)
    assert(s2.select("doc_id").collect().map(_.getLong(0)).toSet ==
      again.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("topTokens counts and tie-breaks deterministically") {
    val s = spark
    import s.implicits._
    val df = Seq("b b a", "A c b", "c  a").toDF("text")
    val got = TextAnalysis.topTokens(df, "text", 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // counts: a=3 (case-folded), b=3, c=2 → ties broken by token asc
    assert(got == Seq(("a", 3L), ("b", 3L), ("c", 2L)))
  }

  test("hashBucket stays in [0, 2^32)") {
    val b = docsDf.select(Sampling.hashBucket(col("doc_id")).as("b"))
      .agg(min("b"), max("b")).head
    assert(b.getLong(0) >= 0L && b.getLong(1) < 4294967296L)
  }

  test("mixToQuotas caps per key, defaults absent keys, and is deterministic") {
    val s = spark
    import s.implicits._
    val df = (0L until 30L).map(i => (i, if (i < 20) "web" else "books"))
      .toDF("doc_id", "source")
    val quotas = Seq(("web", 5L)).toDF("source", "quota")
    val out = Sampling.mixToQuotas(df, "doc_id", "source", quotas, defaultQuota = 8L)
    val byKey = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKey == Map("web" -> 5L, "books" -> 8L),
      "web capped at its quota; books at the default")
    val again = Sampling.mixToQuotas(df, "doc_id", "source", quotas, defaultQuota = 8L)
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet ==
      again.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("mixToQuotas keeps everything when the quota exceeds the key's rows") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "k"), (2L, "k")).toDF("doc_id", "source")
    val out = Sampling.mixToQuotas(df, "doc_id", "source",
      Seq(("k", 100L)).toDF("source", "quota"), defaultQuota = 1L)
    assert(out.count() == 2)
  }

  test("mixToQuotasLarge equals mixToQuotas, with and without the fallback path") {
    val s = spark
    import s.implicits._
    // every 11th key NULL: a legal group that must survive both variants
    val df = (0L until 200L).map(i => (i,
      if (i % 11 == 0) null else if (i % 3 == 0) "web" else "books"))
      .toDF("doc_id", "source")
    val quotas = Seq(("web", 10L)).toDF("source", "quota")
    val exact = Sampling.mixToQuotas(df, "doc_id", "source", quotas, defaultQuota = 7L)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"))).toSet
    // generous slack: threshold path succeeds, no fallback
    val fast = Sampling.mixToQuotasLarge(df, "doc_id", "source", quotas,
      defaultQuota = 7L, slack = 2.0)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"))).toSet
    assert(fast == exact)
    // pathological slack: thresholds cut below the quota-th hash, forcing
    // the exact re-rank fallback — output must STILL be identical
    val fallback = Sampling.mixToQuotasLarge(df, "doc_id", "source", quotas,
      defaultQuota = 7L, slack = 0.01)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"))).toSet
    assert(fallback == exact)
  }

  test("tokenBudgetLarge equals tokenBudget, with and without the fallback path") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    // every 13th shard NULL: a legal window partition in tokenBudget
    val rows = (0L until 300L).map(i =>
      (i, if (i % 13 == 0) null else if (i % 4 == 0) "small" else "big",
        1L + rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
    val df = rows.toDF("doc_id", "lang", "n_tokens", "q_score")
    def ids(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cum_before"))).toSet
    val exact = ids(Sampling.tokenBudget(df, "lang", "doc_id", "q_score", "n_tokens", 200L))
    val fast = ids(Sampling.tokenBudgetLarge(df, "lang", "doc_id", "q_score", "n_tokens",
      200L, slack = 2.0))
    assert(fast == exact)
    // huge budget → every shard keeps everything → the "all survivors
    // fit" + "rows were pruned" combination must trigger the exact
    // fallback wherever pruning happened, and still match exactly
    val exactAll = ids(Sampling.tokenBudget(df, "lang", "doc_id", "q_score", "n_tokens", 100000L))
    val fbAll = ids(Sampling.tokenBudgetLarge(df, "lang", "doc_id", "q_score", "n_tokens",
      100000L, slack = 0.001))
    assert(fbAll == exactAll)
  }

  test("tokenBudget takes a rank-prefix per shard and stops at the budget") {
    val s = spark
    import s.implicits._
    val df = Seq(
      // lang a: scores 30 > 20 > 10, tokens 40+40 fit in 100, +40 would too
      (0L, "a", 40L, 30L), (1L, "a", 40L, 20L), (2L, "a", 40L, 10L),
      // lang b: first doc alone overflows the budget → b keeps nothing
      (3L, "b", 150L, 99L), (4L, "b", 10L, 1L))
      .toDF("doc_id", "lang", "n_tokens", "q_score")
    val out = Sampling.tokenBudget(df, "lang", "doc_id", "q_score", "n_tokens",
      budget = 100L)
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 1L),
      s"lang a keeps its two best (80 <= 100 but 120 > 100); lang b's first doc " +
        s"overflows so later docs are cut too (prefix rule): $kept")
    val cum = out.filter(col("doc_id") === 1L).head.getAs[Long]("cum_before")
    assert(cum == 40L)
  }

  test("a NULL key in the quotas CONFIG reaches both mix variants identically") {
    val s = spark
    import s.implicits._
    // 15 NULL-key rows and 15 "web" rows; the CONFIG assigns the NULL key
    // quota 3. Before the shared null-safe config join, the exact variant
    // silently fell back to defaultQuota for NULL while the two-phase one
    // honored the configured 3 — the advice-flagged parity break.
    val df = (0L until 30L).map(i => (i, if (i % 2 == 0) null else "web"))
      .toDF("doc_id", "source")
    val quotas = Seq((null: String, 3L), ("web", 4L)).toDF("source", "quota")
    def keyCounts(d: org.apache.spark.sql.DataFrame) =
      d.groupBy("source").count().collect()
        .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    val exact = Sampling.mixToQuotas(df, "doc_id", "source", quotas, defaultQuota = 9L)
    assert(keyCounts(exact) == Map(None -> 3L, Some("web") -> 4L),
      "NULL config key must cap the NULL group, not defaultQuota")
    val fast = Sampling.mixToQuotasLarge(df, "doc_id", "source", quotas,
      defaultQuota = 9L, slack = 2.0)
    assert(fast.select("doc_id").collect().map(_.getLong(0)).toSet ==
      exact.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("duplicate keys in the quotas config are rejected, not fanned out") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "k"), (2L, "k")).toDF("doc_id", "source")
    val dup = Seq(("k", 1L), ("k", 2L)).toDF("source", "quota")
    def msg(e: Throwable): String =
      e.getMessage + String.valueOf(e.getCause)
    // raises at execution (the check rides the config plan, not an
    // eager validation job at build time)
    val e1 = intercept[Exception](
      Sampling.mixToQuotas(df, "doc_id", "source", dup, defaultQuota = 1L).collect())
    assert(msg(e1).contains("duplicate"))
    val e2 = intercept[Exception](
      Sampling.mixToQuotasLarge(df, "doc_id", "source", dup, defaultQuota = 1L).collect())
    assert(msg(e2).contains("duplicate"))
  }

  test("temperatureTargets apportions the budget exactly and flattens skew") {
    val s = spark
    import s.implicits._
    // counts 1 / 10 / 100, tau 0.5 → weights 1 : √10 : 10, no clean split;
    // Hamilton apportionment must still land on the budget EXACTLY
    val df = ((0 until 1).map(i => (i.toLong, "tiny")) ++
      (0 until 10).map(i => (100L + i, "mid")) ++
      (0 until 100).map(i => (1000L + i, "big"))).toDF("doc_id", "source")
    val t = Sampling.temperatureTargets(df, "source", 0.5, totalBudget = 37L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(t.values.sum == 37L, s"largest-remainder must hit the budget: $t")
    // hand-derived: w = (1e6, 3162277, 1e7), W = 14162277; floors (2, 8, 26)
    // leave 1 short row, and tiny holds the largest remainder → +1
    assert(t == Map("tiny" -> 3L, "mid" -> 8L, "big" -> 26L), t.toString)
    // flattening: tiny's MIX share (3/37) exceeds its raw share (1/111)
    assert(t("tiny") * 111L > 1L * 37L)
    // monotone: a bigger source never gets a smaller target
    assert(t("big") >= t("mid") && t("mid") >= t("tiny"))
  }

  test("temperatureTargets at tau = 1 reproduces the natural distribution") {
    val s = spark
    import s.implicits._
    val df = ((0 until 10).map(i => (i.toLong, "a")) ++
      (0 until 30).map(i => (100L + i, "b"))).toDF("doc_id", "source")
    val t = Sampling.temperatureTargets(df, "source", 1.0, totalBudget = 4L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(t == Map("a" -> 1L, "b" -> 3L))
  }

  test("temperatureMix keeps exactly the budget, NULL keys included, deterministically") {
    val s = spark
    import s.implicits._
    // a NULL key is a legal group — it must earn and fill a target too
    val df = (0L until 120L).map(i => (i,
      if (i % 12 == 0) null else if (i % 3 == 0) "web" else "books"))
      .toDF("doc_id", "source")
    val out = Sampling.temperatureMix(df, "doc_id", "source", 0.5, totalBudget = 30L)
    assert(out.count() == 30L, "every key holds >= its quota, so the mix is exact")
    val byKey = out.groupBy("source").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(byKey.keySet.contains(None), s"NULL group must participate: $byKey")
    val again = Sampling.temperatureMix(df, "doc_id", "source", 0.5, totalBudget = 30L)
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet ==
      again.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("temperatureTargets rejects bad tau, budget, and a 'quota' key column") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "k")).toDF("doc_id", "source")
    intercept[IllegalArgumentException](
      Sampling.temperatureTargets(df, "source", 0.0, 10L))
    intercept[IllegalArgumentException](
      Sampling.temperatureTargets(df, "source", 1.5, 10L))
    intercept[IllegalArgumentException](
      Sampling.temperatureTargets(df, "source", 0.5, -1L))
    intercept[IllegalArgumentException](
      Sampling.temperatureTargets(df.withColumnRenamed("source", "quota"),
        "quota", 0.5, 10L))
  }

  test("tokenBudget raises on NULL or negative token counts") {
    val s = spark
    import s.implicits._
    val neg = Seq((1L, "a", 10L, 5L), (2L, "a", -3L, 4L))
      .toDF("doc_id", "lang", "n_tokens", "q_score")
    val eNeg = intercept[Exception](
      Sampling.tokenBudget(neg, "lang", "doc_id", "q_score", "n_tokens", 100L)
        .collect())
    assert(eNeg.getMessage.contains("non-negative") ||
      String.valueOf(eNeg.getCause).contains("non-negative"))
    val nul = Seq((1L, "a", Some(10L), 5L), (2L, "a", None, 4L))
      .toDF("doc_id", "lang", "n_tokens", "q_score")
    val eNul = intercept[Exception](
      Sampling.tokenBudget(nul, "lang", "doc_id", "q_score", "n_tokens", 100L)
        .collect())
    assert(eNul.getMessage.contains("non-negative") ||
      String.valueOf(eNul.getCause).contains("non-negative"))
  }
}
