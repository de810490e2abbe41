package graft.functions

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ZOrderSpec extends SparkTestBase {

  test("zValue matches the reference interleave on known and random inputs") {
    val s = spark
    import s.implicits._
    // hand-checked: a=0b11 (odd positions), b=0b00 → 0b1010 = 10
    assert(ZOrder.zValueRef(3L, 0L, 2) == 10L)
    assert(ZOrder.zValueRef(0L, 3L, 2) == 5L)
    assert(ZOrder.zValueRef(1L, 1L, 1) == 3L)
    val rnd = new scala.util.Random(11)
    val cases = Seq.fill(100)((rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    val got = cases.toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b"), 16).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == cases.map { case (a, b) => ZOrder.zValueRef(a, b, 16) },
      "column expression must equal the reference implementation")
  }

  test("z-ordering is monotone in quadrants: high bits split the plane") {
    // any point in the low-low quadrant sorts before any in high-high
    val lo = for (a <- 0L until 8L; b <- 0L until 8L) yield ZOrder.zValueRef(a, b, 4)
    val hi = for (a <- 8L until 16L; b <- 8L until 16L) yield ZOrder.zValueRef(a, b, 4)
    assert(lo.max < hi.min)
  }

  test("writeZOrdered gives every file a tight envelope in BOTH dimensions") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5)
    val df = Seq.fill(20000)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
      .toDF("x", "y")
    val dir = Files.createTempDirectory("graft_zorder").toString
    graft.sources.Layout.writeZOrdered(df, dir, "x", "y", numFiles = 16, bits = 10)
    val perFile = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg((max("x") - min("x")).as("ex"), (max("y") - min("y")).as("ey"))
      .collect()
    assert(perFile.length >= 8, s"expected multiple files, got ${perFile.length}")
    // a random (unsorted) layout would give every file ~full extent
    // (~1023) in both dims; z-ordering must shrink the average envelope
    // AREA by an order of magnitude
    val meanArea = perFile.map(r =>
      (r.getAs[Long]("ex") + 1).toDouble * (r.getAs[Long]("ey") + 1)).sum / perFile.length
    assert(meanArea < 1024.0 * 1024.0 / 4,
      s"mean per-file envelope area $meanArea not tight — layout not z-clustered")
    // and the predicate on the NON-leading dimension still pushes down
    val q = spark.read.parquet(dir).filter(col("y") < 64)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(y), LessThan(y,64)"),
      s"y predicate must reach the scan for row-group pruning:\n$plan")
    assert(q.count() == df.filter(col("y") < 64).count())
  }
}
