package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DecontaminateSpec extends SparkTestBase {

  test("contaminated docs flag with their shared-gram count; clean docs don't") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      (2L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // verbatim copy of eval doc 1 → every one of its 2 distinct 8-grams
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      // contains eval doc 2's first 8 tokens → exactly 1 shared 8-gram
      (11L, "prefix one two three four five six seven eight suffix"),
      // clean
      (12L, "totally unrelated words that never appear in the eval set at all"))
      .toDF("doc_id", "text")
    val got = Decontaminate.overlapCounts(corpus, ev, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(10L -> 2L, 11L -> 1L), s"got $got")
  }

  test("short docs match as whole-text grams (verbatim short eval doc flags)") {
    val s = spark
    import s.implicits._
    val ev = Seq((1L, "tiny eval prompt")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "tiny eval prompt"),
      (11L, "tiny eval prompt with extra words making it long enough to differ"))
      .toDF("doc_id", "text")
    val got = Decontaminate.overlapCounts(corpus, ev, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // doc 11 is >= 8 tokens so its grams are true 8-grams — none equals
    // the eval's whole-text gram; only the verbatim copy flags
    assert(got == Map(10L -> 1L), s"got $got")
  }

  test("eval report: per-eval-doc fractions, clean docs emit 0, corpus side broadcasts nothing") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      // 2 distinct 8-grams, both leaked via the verbatim corpus copy
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      // 4 distinct 8-grams, exactly one (tokens 1-8) in the corpus
      (2L, "one two three four five six seven eight nine ten eleven"),
      // clean — still emits a row with 0
      (3L, "completely clean eval doc with no leaked grams anywhere here"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      // duplicate occurrences of the same leaked gram count ONCE
      (11L, "prefix one two three four five six seven eight suffix"),
      (12L, "again one two three four five six seven eight trailer"))
      .toDF("doc_id", "text")
    val got = Decontaminate.evalContamination(corpus, ev, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      1L -> ((2L, 2L, 1000L)),
      2L -> ((4L, 1L, 250L)),
      3L -> ((3L, 0L, 0L))), s"got $got")
  }

  test("eval report plan: eval digest set broadcasts; corpus never exchanges text") {
    val s = spark
    import s.implicits._
    val ev = Seq((1L, "a b c d e f g h i")).toDF("doc_id", "text")
    val corpus = Seq((10L, "a b c d e f g h i j k")).toDF("doc_id", "text")
    val plan = Decontaminate.evalContamination(corpus, ev, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      s"eval grams must broadcast to the corpus stream:\n$plan")
    plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).foreach { l =>
      assert(!l.contains("text"), s"text must not shuffle: $l\n$plan")
    }
  }

  test("overlap join shuffles digests, not text (no text column past the explode)") {
    val s = spark
    import s.implicits._
    val ev = Seq((1L, "a b c d e f g h i")).toDF("doc_id", "text")
    val plan = Decontaminate.overlapCounts(ev, ev, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // every exchange must carry only id/digest columns — the raw text
    // stays partition-local before the first shuffle. Scan whole Exchange
    // LINES (a nested-paren regex group would stop at the first ')') and
    // require at least one, so the assert can't pass vacuously.
    val exchanges = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.nonEmpty, s"expected at least one exchange:\n$plan")
    exchanges.foreach { l =>
      assert(!l.contains("text"), s"text must not shuffle: $l\n$plan")
    }
  }

  // orthogonal unit vectors + an in-between: cosine(e1, mix) ≈ 0.8
  private def semVecs = {
    val s = spark
    import s.implicits._
    val e1 = Array(1f, 0f, 0f, 0f)
    val e2 = Array(0f, 1f, 0f, 0f)
    val mix = Array(0.8f, 0.6f, 0f, 0f)
    (Seq((1L, e1), (2L, e2)).toDF("vec_id", "embedding"),
      Seq((10L, e1), (11L, mix), (12L, Array(0f, 0f, 1f, 0f)),
        (13L, e2), (14L, e1)).toDF("vec_id", "embedding"))
  }

  test("semanticFlags: matches flag with count + smallest eval id; near-misses don't") {
    val (ev, corpus) = semVecs
    val got = Decontaminate.semanticFlags(corpus, ev, "vec_id", "embedding", 0.98)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // 10 and 14 match eval 1; 13 matches eval 2; 11 (cos 0.8) and 12
    // (orthogonal) stay clean — the threshold separates paraphrase-level
    // similarity from mere relatedness
    assert(got == Map(10L -> (1L, 1L), 13L -> (1L, 2L), 14L -> (1L, 1L)),
      s"got $got")
  }

  test("semanticFlags: cell-blocked flavor agrees with exact on same-cell matches") {
    val (ev, corpus) = semVecs
    // centroids at e1/e2: every matching pair shares its nearest cell,
    // so the blocked flavor must reproduce the exact answer here
    val cs = Array(Array(1d, 0d, 0d, 0d), Array(0d, 1d, 0d, 0d))
    val exact = Decontaminate.semanticFlags(corpus, ev, "vec_id", "embedding", 0.98)
      .collect().map(_.toSeq).toSet
    val blocked = Decontaminate.semanticFlags(corpus, ev, "vec_id", "embedding",
      0.98, centroids = Some(cs)).collect().map(_.toSeq).toSet
    assert(blocked == exact)
  }

  test("semanticFlags: eval side broadcasts; no corpus-side shuffle before the filter") {
    val (ev, corpus) = semVecs
    val plan = Decontaminate.semanticFlags(corpus, ev, "vec_id", "embedding", 0.98)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"eval side must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no sort-merge join:\n$plan")
    // the only hash exchange is the post-filter aggregate on flagged rows
    val hashEx = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx <= 1, s"expected at most the aggregate exchange, got $hashEx:\n$plan")
    intercept[IllegalArgumentException] {
      Decontaminate.semanticFlags(corpus.withColumn("__eid", lit(1)),
        ev, "vec_id", "embedding", 0.98)
    }
  }
}
