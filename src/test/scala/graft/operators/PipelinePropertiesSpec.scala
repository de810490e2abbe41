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

  test("property: MV fold equals recompute for random update/delete/insert batches") {
    // facts: (id, key, v); a random subset updates to a new v, a disjoint
    // random subset deletes, plus random inserted facts — the folded view
    // must equal the recomputed view, also when the delta is folded in
    // two sequential halves (the q_stream_mv composition law)
    val factsGen = Gen.listOfN(10, for {
      k <- Gen.oneOf("a", "b", "c")
      v <- Gen.chooseNum(1L, 9L)
    } yield (k, v))
    val opsGen = Gen.listOfN(10, Gen.chooseNum(0, 3)) // 0 keep 1 upd 2 del
    val insGen = Gen.listOfN(3, for {
      k <- Gen.oneOf("a", "b", "c", "d")
      v <- Gen.chooseNum(1L, 9L)
    } yield (k, v))
    check(8)(Prop.forAll(factsGen, opsGen, insGen) { (facts, ops, ins) =>
      val s = spark
      import s.implicits._
      val tagged = facts.zip(ops)
      def df(rows: Seq[(String, Long)]) =
        rows.toDF("k", "sum_v")
      def view(rows: Seq[(String, Long)]) =
        df(rows).groupBy("k").agg(sum("sum_v").as("sum_v"), count(lit(1)).as("n"))
      def viewSet(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val olds = tagged.collect { case ((k, v), op) if op == 1 || op == 2 => (k, v) }
      val news = tagged.collect { case ((k, v), op) if op == 1 => (k, v + 100L) } ++ ins
      val finalFacts = tagged.collect { case ((k, v), op) if op == 0 || op == 3 => (k, v) } ++
        tagged.collect { case ((k, v), op) if op == 1 => (k, v + 100L) } ++ ins
      val expected = viewSet(view(finalFacts))
      val delta = IncrementalAgg.retractionDelta(df(olds), df(news),
        Seq("k"), Seq("sum_v"), "n")
      val oneFold = viewSet(IncrementalAgg.applyDelta(view(facts.map(identity)), delta,
        Seq("k"), Seq("sum_v"), "n"))
      // two-fold split: retract/add pairs of the same UPDATE stay together
      // (split by op class: updates+deletes first, inserts second)
      val d1 = IncrementalAgg.retractionDelta(df(olds),
        df(tagged.collect { case ((k, v), op) if op == 1 => (k, v + 100L) }),
        Seq("k"), Seq("sum_v"), "n")
      val d2 = IncrementalAgg.retractionDelta(df(Seq.empty), df(ins),
        Seq("k"), Seq("sum_v"), "n")
      val twoFold = viewSet(IncrementalAgg.applyDelta(
        IncrementalAgg.applyDelta(view(facts.map(identity)), d1,
          Seq("k"), Seq("sum_v"), "n"),
        d2, Seq("k"), Seq("sum_v"), "n"))
      oneFold == expected && twoFold == expected
    })
  }

  test("property: SCD2 rebuild is idempotent and composes over time-split batches") {
    val changeGen = Gen.listOfN(8, for {
      id <- Gen.chooseNum(1L, 3L)
      lang <- Gen.oneOf("x", "y", "z")
      ts <- Gen.chooseNum(0L, 6L)
      op <- Gen.frequency(3 -> Gen.const("u"), 1 -> Gen.const("d"))
    } yield (id, lang, ts, op))
    check(8)(Prop.forAll(changeGen) { changes =>
      val s = spark
      import s.implicits._
      def hist(rows: Seq[(Long, String, Long, Option[Long])]) =
        rows.map { case (id, l, f, t) => (id, l, f, t.map(Long.box).orNull) }
          .toDF("id", "lang", "valid_from", "valid_to")
          .select(col("id"), col("lang"), col("valid_from"),
            col("valid_to").cast("long"))
      def rebuild(h: org.apache.spark.sql.DataFrame,
                  b: Seq[(Long, String, Long, String)]) =
        Scd2.applyHistory(h, b.toDF("id", "lang", "ts", "op"),
          Seq("id"), "ts", Some("op"))
      def toSet(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
      def toRows(st: Set[(Long, String, Long, Option[Long])]) = st.toSeq
      val empty = hist(Seq.empty)
      val oneShot = toSet(rebuild(empty, changes))
      // idempotence: re-applying the same batch onto the result is a no-op
      val reapplied = toSet(rebuild(hist(toRows(oneShot)), changes))
      // time-monotone composition: early (ts <= 3) then late (ts > 3)
      // through a materialized intermediate history
      val early = changes.filter(_._3 <= 3)
      val late = changes.filter(_._3 > 3)
      val mid = toSet(rebuild(empty, early))
      val composed = toSet(rebuild(hist(toRows(mid)), late))
      reapplied == oneShot && composed == oneShot
    })
  }

  test("property: the expectations gate partitions exactly with row-wise truth") {
    val rowGen = Gen.listOfN(8, for {
      v <- Gen.option(Gen.chooseNum(0L, 20L))
      t <- Gen.option(Gen.oneOf("", "ok", "word"))
    } yield (v, t))
    check(8)(Prop.forAll(rowGen) { rows =>
      val s = spark
      import s.implicits._
      val df = rows.zipWithIndex.map { case ((v, t), i) =>
        (i.toLong, v.map(Long.box).orNull, t.orNull)
      }.toDF("id", "v", "t").select(col("id"), col("v").cast("long"), col("t"))
      val checks = Seq(
        Expectations.Check("v_min", col("v") >= 5L),
        Expectations.Check("t_present", col("t").isNotNull && length(col("t")) > 0))
      val (clean, bad) = Expectations.gate(df, checks)
      val cleanIds = clean.collect().map(_.getLong(0)).toSet
      val badMap = bad.collect()
        .map(r => r.getLong(0) -> r.getSeq[String](r.fieldIndex("violations")).toList)
        .toMap
      rows.zipWithIndex.forall { case ((v, t), i) =>
        val fails = List(
          if (!v.exists(_ >= 5L)) Some("v_min") else None,
          if (!t.exists(_.nonEmpty)) Some("t_present") else None).flatten
        if (fails.isEmpty) cleanIds(i.toLong) && !badMap.contains(i.toLong)
        else badMap.get(i.toLong).contains(fails) && !cleanIds(i.toLong)
      }
    })
  }
}
