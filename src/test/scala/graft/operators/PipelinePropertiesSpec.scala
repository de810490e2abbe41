package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkTestBase

/** Property-based coverage for the curation operators added in round 5.
  * Spark actions are expensive, so run counts stay small and every
  * property checks a whole generated batch in one DataFrame pass.
  */
class PipelinePropertiesSpec extends SparkTestBase {

  private def check(n: Int)(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon")
  private val para = Gen.chooseNum(1, 3).flatMap(n =>
    Gen.listOfN(n, word).map(_.mkString(" ")))
  private val paraLists = Gen.listOfN(6,
    Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, para)))

  test("property: paragraph dedup keeps an in-order subsequence, never grows") {
    check(8)(Prop.forAll(paraLists) { lists =>
      val s = spark
      import s.implicits._
      val in = lists.zipWithIndex.map { case (ps, i) => (i.toLong, ps) }
      val df = in.toDF("doc_id", "paras")
      val out = Dedup.dropRepeatedParagraphs(df, "doc_id", "paras", minCount = 3)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_paras"), r.getAs[Long]("n_kept"),
            r.getAs[String]("clean_text"))).toMap
      in.forall { case (id, ps) =>
        out.get(id) match {
          case None => true // every paragraph was corpus-repeated — doc vanishes
          case Some((np, nk, text)) =>
            // counts consistent, and the kept text is the original list with
            // some paragraphs removed, order preserved (subsequence check)
            np == ps.length && nk >= 1 && nk <= np && {
              val kept = text.split(" ").toSeq
              val orig = ps.flatMap(_.split(" ").toSeq)
              // kept tokens must be a subsequence of the original tokens
              val it = orig.iterator
              kept.forall(t => it.contains(t))
            }
        }
      }
    })
  }

  test("property: paragraph dedup with an unreachable threshold is identity") {
    check(6)(Prop.forAll(paraLists) { lists =>
      val s = spark
      import s.implicits._
      val df = lists.zipWithIndex.map { case (ps, i) => (i.toLong, ps) }
        .toDF("doc_id", "paras")
      val out = Dedup.dropRepeatedParagraphs(df, "doc_id", "paras",
        minCount = 1000L)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          r.getAs[String]("clean_text")).toMap
      lists.zipWithIndex.forall { case (ps, i) =>
        out(i.toLong) == ps.mkString(" ")
      }
    })
  }

  private val keyGen = Gen.oneOf("web", "books", "code")
  private val rowsGen = Gen.listOfN(20, keyGen).map(_.zipWithIndex.map {
    case (k, i) => (i.toLong, k)
  })

  test("property: mixToQuotas output per key = min(quota-or-default, available)") {
    check(8)(Prop.forAll(rowsGen, Gen.chooseNum(0L, 6L), Gen.chooseNum(1L, 6L)) {
      (rows, webQuota, dflt) =>
        val s = spark
        import s.implicits._
        val df = rows.toDF("doc_id", "source")
        val quotas = Seq(("web", webQuota)).toDF("source", "quota")
        val out = Sampling.mixToQuotas(df, "doc_id", "source", quotas, dflt)
          .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
        val byKey = out.groupBy(_._2).view.mapValues(_.length.toLong).toMap
        val avail = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
        out.toSet.subsetOf(rows.map { case (id, k) => (id, k) }.toSet) &&
          avail.forall { case (k, n) =>
            val cap = if (k == "web") webQuota else dflt
            byKey.getOrElse(k, 0L) == math.min(cap, n)
          }
    })
  }

  test("property: mixToQuotasLarge equals mixToQuotas for random inputs and slacks") {
    val gen = for {
      rows <- rowsGen
      quota <- Gen.chooseNum(0L, 8L)
      dflt <- Gen.chooseNum(1L, 8L)
      slack <- Gen.oneOf(0.05, 0.5, 2.0, 10.0)
    } yield (rows, quota, dflt, slack)
    check(6)(Prop.forAll(gen) { case (rows, quota, dflt, slack) =>
      val s = spark
      import s.implicits._
      val df = rows.toDF("doc_id", "source")
      val quotas = Seq(("web", quota)).toDF("source", "quota")
      def ids(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(_.getAs[Long]("doc_id")).toSet
      ids(Sampling.mixToQuotasLarge(df, "doc_id", "source", quotas, dflt, slack)) ==
        ids(Sampling.mixToQuotas(df, "doc_id", "source", quotas, dflt))
    })
  }

  test("property: tokenBudgetLarge equals tokenBudget for random inputs and slacks") {
    val gen = for {
      docs <- Gen.listOfN(15, for {
        t <- Gen.chooseNum(1L, 30L); sc <- Gen.chooseNum(0L, 50L)
        shard <- Gen.oneOf("a", "b")
      } yield (t, sc, shard))
      budget <- Gen.chooseNum(5L, 200L)
      slack <- Gen.oneOf(0.05, 1.0, 5.0)
    } yield (docs, budget, slack)
    check(6)(Prop.forAll(gen) { case (docs, budget, slack) =>
      val s = spark
      import s.implicits._
      val df = docs.zipWithIndex.map { case ((t, sc, sh), i) => (i.toLong, sh, t, sc) }
        .toDF("doc_id", "lang", "n_tokens", "q_score")
      def ids(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cum_before"))).toSet
      ids(Sampling.tokenBudgetLarge(df, "lang", "doc_id", "q_score", "n_tokens", budget, slack)) ==
        ids(Sampling.tokenBudget(df, "lang", "doc_id", "q_score", "n_tokens", budget))
    })
  }

  test("property: tokenBudget never exceeds the budget and keeps a rank prefix") {
    val docGen = Gen.listOfN(12, for {
      tokens <- Gen.chooseNum(1L, 50L)
      score <- Gen.chooseNum(0L, 100L)
    } yield (tokens, score))
    check(8)(Prop.forAll(docGen, Gen.chooseNum(10L, 120L)) { (docs, budget) =>
      val s = spark
      import s.implicits._
      val rows = docs.zipWithIndex.map { case ((t, sc), i) => (i.toLong, "x", t, sc) }
      val df = rows.toDF("doc_id", "lang", "n_tokens", "q_score")
      val kept = Sampling.tokenBudget(df, "lang", "doc_id", "q_score", "n_tokens", budget)
        .collect().map(_.getAs[Long]("doc_id")).toSet
      val ranked = rows.sortBy { case (id, _, _, sc) => (-sc, id) }
      val prefixSums = ranked.scanLeft(0L) { case (acc, (_, _, t, _)) => acc + t }.tail
      val expected = ranked.zip(prefixSums)
        .takeWhile { case (_, cum) => cum <= budget }
        .map(_._1._1).toSet
      kept == expected &&
        rows.filter(r => kept(r._1)).map(_._3).sum <= budget
    })
  }
}
