package graft.functions

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class HilbertSpec extends SparkTestBase {

  test("xy2d is bijective with unit-step adjacency — the Hilbert property") {
    for (bits <- Seq(3, 4, 5)) {
      val n = 1 << bits
      val byD = new Array[(Long, Long)](n * n)
      for (x <- 0L until n; y <- 0L until n) {
        val d = Hilbert.xy2d(bits, x, y)
        assert(d >= 0 && d < n.toLong * n, s"index $d out of range at ($x,$y)")
        assert(byD(d.toInt) == null, s"collision at d=$d")
        byD(d.toInt) = (x, y)
      }
      // bijective (no slot left empty) and every consecutive pair of
      // indices is a GRID NEIGHBOUR — the unit-step property Z-order
      // lacks (its jumps at power-of-two boundaries are what widen
      // unaligned-segment envelopes)
      for (d <- 0 until n * n - 1) {
        val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
          s"bits=$bits: jump of ${math.abs(x1 - x2) + math.abs(y1 - y2)} at d=$d")
      }
    }
  }

  test("codegen column equals the interpreted reference; wide inputs mask") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(17)
    // mix of in-range, wide (must mask to low bits), and boundary values
    val cases = Seq.fill(200)((rnd.nextLong().abs, rnd.nextLong().abs)) ++
      Seq((0L, 0L), (1023L, 1023L), (1024L, 0L), (0L, 4096L))
    val got = cases.toDF("a", "b")
      .select(Hilbert.hilbert_index(col("a"), col("b"), 10).as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == cases.map { case (a, b) => Hilbert.xy2d(10, a, b) },
      "generated loop must equal the interpreted twin")
  }

  test("unaligned contiguous segments: Hilbert envelopes beat Morton's") {
    // the claim writeHilbertOrdered rests on, pinned deterministically:
    // split the full 64x64 grid's curve into 10 EQUAL segments (file
    // boundaries NOT on power-of-two tiles, as a size-balancing writer
    // produces); sum of segment bounding-box areas must be strictly
    // smaller under Hilbert than under Morton, because Morton's
    // boundary jumps stretch any segment that crosses a tile edge
    val bits = 6; val n = 1 << bits; val cells = n * n
    def areas(index: (Long, Long) => Long): Long = {
      val byD = new Array[(Long, Long)](cells)
      for (x <- 0L until n; y <- 0L until n) byD(index(x, y).toInt) = (x, y)
      val numSegs = 10
      (0 until numSegs).map { s0 =>
        val seg = byD.slice(s0 * cells / numSegs, (s0 + 1) * cells / numSegs)
        val (xs, ys) = (seg.map(_._1), seg.map(_._2))
        (xs.max - xs.min + 1) * (ys.max - ys.min + 1)
      }.sum
    }
    val hilbert = areas(Hilbert.xy2d(bits, _, _))
    val morton = areas(ZOrder.zValueRef(_, _, bits))
    assert(hilbert < morton,
      s"Hilbert segment-envelope area $hilbert must beat Morton's $morton")
    // and with power-of-4-aligned segments (16 of 256 cells) both curves
    // cover exact quadrants — the tie that shows the win is purely the
    // unaligned-boundary case
    def alignedAreas(index: (Long, Long) => Long): Long = {
      val byD = new Array[(Long, Long)](cells)
      for (x <- 0L until n; y <- 0L until n) byD(index(x, y).toInt) = (x, y)
      (0 until 16).map { s0 =>
        val seg = byD.slice(s0 * 256, (s0 + 1) * 256)
        val (xs, ys) = (seg.map(_._1), seg.map(_._2))
        (xs.max - xs.min + 1) * (ys.max - ys.min + 1)
      }.sum
    }
    assert(alignedAreas(Hilbert.xy2d(bits, _, _))
      == alignedAreas(ZOrder.zValueRef(_, _, bits)))
  }

  test("writeHilbertOrdered: tight per-file envelopes, pushdown intact") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5)
    val df = Seq.fill(20000)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
      .toDF("x", "y")
    val dir = Files.createTempDirectory("graft_hilbert").toString
    graft.sources.Layout.writeHilbertOrdered(df, dir, "x", "y",
      numFiles = 16, bits = 10)
    val perFile = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg((max("x") - min("x")).as("ex"), (max("y") - min("y")).as("ey"))
      .collect()
    assert(perFile.length >= 8, s"expected multiple files, got ${perFile.length}")
    val meanArea = perFile.map(r =>
      (r.getAs[Long]("ex") + 1).toDouble * (r.getAs[Long]("ey") + 1)).sum / perFile.length
    assert(meanArea < 1024.0 * 1024.0 / 4,
      s"mean per-file envelope area $meanArea not tight — not Hilbert-clustered")
    // non-leading-dimension predicate still reaches the scan
    val q = spark.read.parquet(dir).filter(col("y") < 64)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(y), LessThan(y,64)"),
      s"y predicate must reach the scan for row-group pruning:\n$plan")
    assert(q.count() == df.filter(col("y") < 64).count())
  }
}
