package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the file-skipping payoff of the three physical layouts —
  * linear sort, Z-order, Hilbert — as FILES TOUCHED per box predicate:
  * a file is touched iff its per-file (min,max) envelope in (x, y)
  * intersects the query box, which is exactly the decision a min/max-
  * stats pruner (parquet row-group stats, data-skipping indexes) makes.
  * Deterministic: fixed corpus (events sf0.1), fixed 64-file splits,
  * fixed box grid — no timing noise, the committed numbers re-derive
  * bit-for-bit.
  *
  * Box classes: square boxes at two sizes (both-dim predicates), plus
  * x-only and y-only stripes (single-dim predicates — the y-stripe is
  * the case a linear x-sort cannot prune AT ALL).
  */
object LayoutPruneProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val bits = 11
    val df = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id").as("x"),
        col("event_id").bitwiseAND(lit(2047L)).as("y"))

    val base = s"/tmp/graft_layout_probe_${Integer.toHexString(sfDir.hashCode)}"
    val linear = s"$base/linear"
    df.repartitionByRange(64, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linear)
    val zorder = s"$base/zorder"
    graft.sources.Layout.writeZOrdered(df, zorder, "x", "y", 64, bits)
    val hilbert = s"$base/hilbert"
    graft.sources.Layout.writeHilbertOrdered(df, hilbert, "x", "y", 64, bits)

    def envelopes(path: String): Array[(Long, Long, Long, Long)] =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(min("x").as("x0"), max("x").as("x1"),
          min("y").as("y0"), max("y").as("y1"))
        .collect()
        .map(r => (r.getAs[Long]("x0"), r.getAs[Long]("x1"),
          r.getAs[Long]("y0"), r.getAs[Long]("y1")))

    // deterministic box grid per class: 16 positions from a fixed stride
    val xMax = 1500L; val yMax = 2048L
    def boxes(w: Long, h: Long): Seq[(Long, Long, Long, Long)] =
      (0 until 16).map { k =>
        val x0 = (k * 367L) % (if (w >= xMax) 1L else xMax - w)
        val y0 = (k * 541L) % (if (h >= yMax) 1L else yMax - h)
        (x0, x0 + w - 1, y0, y0 + h - 1)
      }
    val classes = Seq(
      ("box128", boxes(128, 128)),
      ("box384", boxes(384, 384)),
      ("xstripe128", boxes(128, yMax)),
      ("ystripe128", boxes(xMax, 128)))

    val layouts = Seq("linear" -> envelopes(linear),
      "zorder" -> envelopes(zorder), "hilbert" -> envelopes(hilbert))
    println(f"${"layout"}%-8s ${"class"}%-11s avg_files_touched (of 64)")
    for ((lname, env) <- layouts; (cname, bs) <- classes) {
      val touched = bs.map { case (bx0, bx1, by0, by1) =>
        env.count { case (x0, x1, y0, y1) =>
          x1 >= bx0 && x0 <= bx1 && y1 >= by0 && y0 <= by1 }
      }
      val avg = touched.sum.toDouble / touched.size
      println(f"$lname%-8s $cname%-11s $avg%6.1f")
    }
    spark.stop()
  }
}
