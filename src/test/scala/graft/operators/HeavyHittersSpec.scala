package graft.operators

import graft.SparkTestBase

class HeavyHittersSpec extends SparkTestBase {

  test("Misra-Gries never exceeds capacity and keeps every item above the share bound") {
    // 100 'a' + 50 'b' + 150 singletons: n=300. capacity=9 => every item
    // with freq > 300/10 = 30 must survive. Singletons may or may not.
    val stream = Seq.fill(100)("a") ++ Seq.fill(50)("b") ++
      (1 to 150).map(i => s"t$i")
    val shuffled = new scala.util.Random(7).shuffle(stream)
    val out = HeavyHitters.misraGries(shuffled.iterator, 9).toSet
    assert(out.size <= 9)
    assert(out.contains("a") && out.contains("b"))
  }

  test("frequentTokens equals the exact GROUP BY / HAVING result") {
    val s = spark
    import s.implicits._
    // 'the' in every doc (3x), 'of' in half, unique filler elsewhere
    val docs = (1 to 200).map { i =>
      val of = if (i % 2 == 0) " of" else s" u$i"
      (i.toLong, s"the the the$of w$i x$i y$i z$i")
    }.toDF("id", "text")
    // 8 tokens/doc, N=1600. share 1/8: cnt*8 >= 1600 => cnt >= 200.
    val got = HeavyHitters.frequentTokens(docs, "text", denom = 8L,
        capacity = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("the", 600L))) // 'of' has 100 < 200; fillers 1 each
  }

  test("threshold boundary is inclusive and exact (cnt*denom == N qualifies)") {
    val s = spark
    import s.implicits._
    // 4 docs x 5 tokens = 20 tokens; 'k' appears exactly 5 = N/4
    val docs = Seq(
      (1L, "k a b c d"), (2L, "k e f g h"),
      (3L, "k i j l m"), (4L, "k k n o p")).toDF("id", "text")
    val got = HeavyHitters.frequentTokens(docs, "text", denom = 4L,
        capacity = 32)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("k", 5L)))
  }

  test("long tail never reaches the count exchange: candidate set bounds the aggregate") {
    val s = spark
    import s.implicits._
    val docs = (1 to 500).map(i => (i.toLong, s"hot hot hot rare$i"))
      .toDF("id", "text").repartition(8)
    val hh = HeavyHitters.frequentTokens(docs, "text", denom = 2L,
      capacity = 16)
    val rows = hh.collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("hot", 1500L)))
    val plan = hh.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.toLowerCase.contains("leftsemi"),
      s"candidates must prune map-side via broadcast semi join:\n$plan")
  }
}
