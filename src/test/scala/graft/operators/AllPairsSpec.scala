package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class AllPairsSpec extends SparkTestBase {
  import spark.implicits._

  /** Brute-force truth: every unordered pair with 10⁶·i² ≥ t²·na·nb,
    * over word-k-gram shingle sets (k=1 → token sets), mirroring
    * Dedup.explodedShingles' short-doc rule (whole text as one shingle).
    */
  private def brute(docs: Seq[(Long, String)], tPerMille: Int,
      k: Int = 1): Set[(Long, Long, Long, Long, Long)] = {
    def sets(s: String): Set[String] = {
      val t = s.trim.toLowerCase.replaceAll("\\s+", " ").split(" ")
      if (t.length < k) Set(t.mkString(" "))
      else t.sliding(k).map(_.mkString(" ")).toSet
    }
    val t2 = tPerMille.toLong * tPerMille
    (for {
      (ia, ta) <- docs.map { case (i, s) => (i, sets(s)) }
      (ib, tb) <- docs.map { case (i, s) => (i, sets(s)) }
      if ia < ib
      i = (ta intersect tb).size.toLong
      if 1000000L * i * i >= t2 * ta.size * tb.size
    } yield (ia, ib, ta.size.toLong, tb.size.toLong, i)).toSet
  }

  private def run(docs: Seq[(Long, String)], tPerMille: Int,
      k: Int = 1): Set[(Long, Long, Long, Long, Long)] =
    AllPairs.cosinePairs(docs.toDF("id", "text"), "id", "text", tPerMille, k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet

  test("hand case: exact duplicates, subsets, disjoint") {
    val docs = Seq(
      (1L, "red green blue"),
      (2L, "blue green red"),        // identical set: cos = 1
      (3L, "red green blue yellow"), // cos = 3/sqrt(12) = 0.866
      (4L, "cyan magenta"))          // disjoint
    val got = run(docs, 800)
    assert(got === Set(
      (1L, 2L, 3L, 3L, 3L),
      (1L, 3L, 3L, 4L, 3L),
      (2L, 3L, 3L, 4L, 3L)))
    // at a higher threshold the 3-of-4 overlap drops out (0.866 < 0.9)
    assert(run(docs, 900) === Set((1L, 2L, 3L, 3L, 3L)))
  }

  test("matches brute force on a randomized corpus at several thresholds") {
    val rnd = new scala.util.Random(42)
    // zipf-ish vocabulary: token k appears with weight ~ 1/(k+1)
    val vocab = (0 until 30).map(k => s"tok$k")
    def doc(): String = {
      val n = 3 + rnd.nextInt(10)
      Seq.fill(n) {
        val u = rnd.nextDouble()
        vocab((math.pow(u, 2.0) * vocab.size).toInt.min(vocab.size - 1))
      }.mkString(" ")
    }
    val docs = (0 until 60).map(i => (i.toLong, doc()))
    for (t <- Seq(500, 700, 850)) {
      assert(run(docs, t) === brute(docs, t), s"threshold $t")
    }
  }

  test("stopword-only overlap generates no candidate pairs at high threshold") {
    // every doc shares "the" and "and" (max df) but nothing else;
    // pairwise cos = 2/sqrt(5*5) = 0.4 — prefix filtering must both
    // PRUNE them from the join and stay exact
    val docs = (0 until 20).map(i => (i.toLong, s"the and u$i v$i w$i"))
    assert(run(docs, 700) === Set.empty)
    assert(run(docs, 700) === brute(docs, 700))
  }

  test("shingle mode matches brute force (k=3) and separates shared-vocab docs") {
    // same tiny vocabulary everywhere (like the fixture corpus) — unigram
    // sets would call everything a duplicate; 3-gram shingles only match
    // the genuinely repeated passage
    val base = "the cat sat on the mat and the dog ran off"
    val docs = Seq(
      (1L, base),
      (2L, base + " again"),                          // near-dup of 1
      (3L, "the dog sat on the cat and the mat ran"), // same words, reshuffled
      (4L, "off ran dog the and mat the on sat cat the"))
    for (t <- Seq(400, 700, 900)) {
      assert(run(docs, t, k = 3) === brute(docs, t, k = 3), s"threshold $t")
    }
    // the reshuffles must NOT pair with 1 at k=3, t=700
    val pairs = run(docs, 700, k = 3).map(p => (p._1, p._2))
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._2 == 3L || p._2 == 4L))
  }

  test("plan: no cartesian product; verify runs on id-joined sets") {
    val docs = Seq((1L, "a b"), (2L, "b c")).toDF("id", "text")
    val plan = AllPairs.cosinePairs(docs, "id", "text", 500)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("tracker.release() frees the checkpointed element blocks") {
    val docs = (0 until 40).map(i => (i.toLong, s"w${i % 5} w${(i + 1) % 5} w${(i + 2) % 7}"))
      .toDF("id", "text")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val tracker = new CacheTracker
    AllPairs.cosinePairs(docs, "id", "text", 500, tracker = tracker)
      .write.mode("overwrite").format("noop").save()
    val during = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(during.nonEmpty, "the element checkpoint should pin blocks")
    tracker.release()
    val after = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(after.isEmpty,
      s"release() must unpersist the checkpointed RDDs, still pinned: $after")
  }

  test("threshold bounds are enforced") {
    val docs = Seq((1L, "a")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      AllPairs.cosinePairs(docs, "id", "text", 0)
    }
    intercept[IllegalArgumentException] {
      AllPairs.cosinePairs(docs, "id", "text", 1000)
    }
  }
}
