package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ExpectationsSpec extends SparkTestBase {

  private def docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, Some("hello world"), Some(11L)),  // clean
      (2L, Some("hi"), Some(2L)),            // too short
      (3L, None: Option[String], Some(5L)),  // null text -> two violations
      (4L, Some("x" * 600), Some(600L)),     // too long
      (5L, Some("ok length here"), None: Option[Long]) // null len -> NULL preds
    ).toDF("id", "text", "len")
  }

  private val checks = Seq(
    Expectations.Check("len_min", col("len") >= 5L),
    Expectations.Check("len_max", col("len") <= 500L),
    Expectations.Check("text_present", col("text").isNotNull))

  test("gate splits exactly; violations carry names in declaration order") {
    val (clean, bad) = Expectations.gate(docs, checks)
    assert(clean.columns.toSeq == Seq("id", "text", "len"),
      "clean side must keep the input schema exactly")
    assert(clean.select("id").collect().map(_.getLong(0)).toSet == Set(1L))
    val got = bad.select(col("id"), col("violations"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(got(2L) == List("len_min"))
    assert(got(4L) == List("len_max"))
    assert(got(3L) == List("text_present"))
    // NULL predicate = violation, and order follows check declaration
    assert(got(5L) == List("len_min", "len_max"))
    // exact partition: disjoint and exhaustive
    assert(clean.count() + bad.count() == docs.count())
  }

  test("the gate is one narrow pass: no shuffle in either output's plan") {
    val (clean, bad) = Expectations.gate(docs, checks)
    for (side <- Seq(clean, bad)) {
      val plan = side.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"gate must stay a projection+filter, no shuffle:\n$plan")
    }
  }

  test("kAnonymityViolations: undersized groups flagged, nulls group together") {
    import spark.implicits._
    val d = Seq(
      ("a", "x"), ("a", "x"), ("a", "x"),          // size 3: safe at k=3
      ("a", "y"), ("a", "y"),                      // size 2: violation
      ("b", "x"),                                  // size 1: violation
      (null, "z"), (null, "z")                     // null quasi value: one group of 2
    ).toDF("q1", "q2")
    val got = Expectations.kAnonymityViolations(d, Seq("q1", "q2"), 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(("a", "y", 2L), ("b", "x", 1L), (null, "z", 2L)))
    // one map-side-combinable aggregate: exactly one exchange
    val plan = Expectations.kAnonymityViolations(d, Seq("q1", "q2"), 3)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 1)
    intercept[IllegalArgumentException] {
      Expectations.kAnonymityViolations(d, Seq.empty, 3)
    }
    intercept[IllegalArgumentException] {
      Expectations.kAnonymityViolations(d, Seq("q1"), 1)
    }
  }

  test("contract violations are rejected eagerly") {
    intercept[IllegalArgumentException] {
      Expectations.gate(docs, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Expectations.gate(docs,
        Seq(Expectations.Check("a", lit(true)), Expectations.Check("a", lit(false))))
    }
    intercept[IllegalArgumentException] {
      Expectations.gate(docs.withColumn("violations", lit(1)), checks)
    }
  }
}
