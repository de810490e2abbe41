package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class VectorOpsSpec extends SparkTestBase {

  private def interpDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private def interpSq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => { val d = x.cast("double") - y; d * d }),
      lit(0.0), (acc, v) => acc + v)

  test("native dot/sq-dist are BIT-identical to the interpreted HOF twins") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(200)((
      Seq.fill(64)(rnd.nextGaussian().toFloat),
      Seq.fill(64)(rnd.nextGaussian().toFloat)))
    val df = rows.toDF("a", "b")
    val got = df.select(
      VectorOps.dot_product(col("a"), col("b")).as("nd"),
      interpDot(col("a"), col("b")).as("id"),
      VectorOps.sq_l2_dist(col("a"), col("b")).as("ns"),
      interpSq(col("a"), col("b")).as("is")).collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
        s"dot differs: ${r.getDouble(0)} vs ${r.getDouble(1)}")
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)),
        s"sq-dist differs: ${r.getDouble(2)} vs ${r.getDouble(3)}")
    }
  }

  test("double-array right side (literal centroids) matches interpreted") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(9)
    val cent = Array.fill(16)(rnd.nextGaussian())
    val df = Seq(Seq.fill(16)(rnd.nextGaussian().toFloat)).toDF("v")
    val got = df.select(
      VectorOps.sq_l2_dist(col("v"), typedlit(cent.toSeq)).as("n"),
      interpSq(col("v"), typedlit(cent.toSeq)).as("i")).collect().head
    assert(java.lang.Double.doubleToRawLongBits(got.getDouble(0)) ==
      java.lang.Double.doubleToRawLongBits(got.getDouble(1)))
  }

  test("null semantics mirror zip_with: length mismatch and null element fold to NULL") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Seq(1.0f, 2.0f), Seq(1.0f)),             // length mismatch
      (Seq(1.0f, 2.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    val got = df.select(VectorOps.dot_product(col("a"), col("b")).as("d"),
      interpDot(col("a"), col("b")).as("i")).collect()
    assert(got(0).isNullAt(0) && got(0).isNullAt(1), "mismatch -> null, both flavors")
    assert(got(1).getDouble(0) == 5.0)
    val withNull = Seq((Seq(Some(1.0f), None), Seq(Some(1.0f), Some(2.0f))))
      .toDF("a", "b")
      .select(VectorOps.dot_product(col("a"), col("b")).as("d"),
        interpDot(col("a"), col("b")).as("i")).collect().head
    assert(withNull.isNullAt(0) && withNull.isNullAt(1), "null element -> null, both flavors")
    // null ARRAY input -> null
    val nullArr = Seq((Option.empty[Seq[Float]], Some(Seq(1.0f))))
      .toDF("a", "b")
      .select(VectorOps.dot_product(col("a"), col("b"))).collect().head
    assert(nullArr.isNullAt(0))
  }

  test("the expression participates in codegen (no interpreted fallback in plan)") {
    // a local Seq would constant-fold into a LocalTableScan; range() keeps
    // the projection in the physical plan
    val df = spark.range(3).select(
      array(col("id").cast("float"), lit(1.0f)).as("a"),
      array(lit(2.0f), col("id").cast("float")).as("b"))
      .select(col("a"), VectorOps.dot_product(col("a"), col("b")).as("d"))
    // the "*(n)" prefix is the WholeStageCodegen marker in plan strings;
    // an interpreted fallback would print an unstarred Project
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("dot_product"),
      s"expected the dot inside a codegen span:\n$plan")
    val got = df.orderBy("d").collect().map(_.getDouble(1)).toSeq
    assert(got == Seq(0.0, 3.0, 6.0), s"2*id + 1*id = 3*id expected, got $got")
  }
}
