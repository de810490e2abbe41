package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class AsOfSpec extends SparkTestBase {

  private def sides = {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (2L, 5L, "p3"), (3L, 7L, "p4"))
      .toDF("k", "ts", "name")
    val right = Seq((1L, 8L, "a"), (1L, 15L, "b"), (1L, 20L, "c"), (9L, 1L, "z"))
      .toDF("k", "ts", "v")
    (left, right)
  }

  test("as-of semantics: latest right row with ts <= left ts, per key") {
    val (left, right) = sides
    val got = AsOf.asofJoin(left, right, Seq("k"), "ts", "ts", Seq("ts", "v"))
      .orderBy("k", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getStruct(3)).map(_.getString(1)).orNull)).toSeq
    assert(got == Seq(
      (1L, 10L, "a"),  // 8 <= 10, 15 is too late
      (1L, 20L, "c"),  // ties match (>= semantics): right@20 beats right@15
      (2L, 5L, null),  // key 2 has no right rows
      (3L, 7L, null))) // key 3 has no right rows
  }

  test("one shuffle: both sides exchange once on the key, no join node") {
    val (left, right) = sides
    val p = AsOf.asofJoin(left, right, Seq("k"), "ts", "ts", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"no join operator expected:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"single key exchange expected:\n$p")
  }

  test("randomized: agrees with the naive formulation on 500 rows") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    val left = (0 until 300).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "ts", "lid")
    val right = (0 until 200).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "ts", "rid")
    val viaAsof = AsOf.asofJoin(left, right, Seq("k"), "ts", "ts", Seq("ts"))
      .select(col("lid"), col("asof.ts").as("m"))
      .orderBy("lid").collect().map(r => (r.getLong(0), Option(r.get(1)))).toSeq
    val viaJoin = left.as("l")
      .join(right.as("r"), col("l.k") === col("r.k") && col("l.ts") >= col("r.ts"), "left")
      .groupBy(col("lid")).agg(max(col("r.ts")).as("m"))
      .orderBy("lid").collect().map(r => (r.getLong(0), Option(r.get(1)))).toSeq
    assert(viaAsof == viaJoin)
  }

  test("matches the equivalent (but unscalable) join-window formulation") {
    val (left, right) = sides
    val viaAsof = AsOf.asofJoin(left, right, Seq("k"), "ts", "ts", Seq("ts"))
      .select(col("k"), col("ts"), col("asof.ts").as("m"))
      .orderBy("k", "ts").collect().toSeq
    val viaJoin = left.as("l")
      .join(right.as("r"), col("l.k") === col("r.k") && col("l.ts") >= col("r.ts"), "left")
      .groupBy(col("l.k").as("k"), col("l.ts").as("ts"))
      .agg(max(col("r.ts")).as("m"))
      .orderBy("k", "ts").collect().toSeq
    assert(viaAsof == viaJoin)
  }
}
