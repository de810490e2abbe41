package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Snapshots
import graft.sources.Snapshots.{LongRange, StatRange}

/** Measures MANIFEST-LEVEL multi-column pruning (the r14
  * `Snapshots.readPrunedWhere` machinery, exercised through
  * [[Snapshots.plannedFiles]] itself — not an envelope simulation like
  * [[LayoutPruneProbe]]): files PLANNED per predicate class on the same
  * corpus committed two ways, both carrying (event_id, user_id) stats:
  *
  *   - `linear`:  range-clustered on event_id only (the 1-D layout
  *     q_manifest_prune uses) — user_id ranges per file span ~the whole
  *     domain, so the second predicate can prune nothing;
  *   - `hilbert`: Hilbert-clustered on (event_id, user_id) (the layout
  *     q_manifest_prune_multi commits) — every file is a tight blob in
  *     BOTH dimensions, so a conjunction prunes multiplicatively.
  *
  * Deterministic: fixed corpus (events sf0.1), fixed 16-file splits,
  * fixed predicate grid. The committed table re-derives bit-for-bit.
  */
object ManifestPruneProbe {

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

    val e = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value"))
    val base = s"/tmp/graft_manifest_probe_${Integer.toHexString(sfDir.hashCode)}"

    val linear = s"$base/linear"
    Snapshots.commitOverwrite(spark, linear,
      e.repartitionByRange(16, col("event_id"))
        .sortWithinPartitions("event_id"),
      statsCols = Seq("event_id", "user_id"))

    val hilbert = s"$base/hilbert"
    // normalize both dims onto the 2^17 grid (user_id is ~87x denser),
    // exactly as q_manifest_prune_multi commits it
    val h = graft.functions.Hilbert.hilbert_index(
      col("event_id"), col("user_id") * 87L, 17)
    Snapshots.commitOverwrite(spark, hilbert,
      e.withColumn("__h", h).repartitionByRange(16, col("__h"))
        .sortWithinPartitions("__h").drop("__h"),
      statsCols = Seq("event_id", "user_id"))

    // deterministic predicate grid: 16 positions per class over the
    // sf0.1 domain (event_id 0..99999, user_id 0..1499)
    val (xMax, yMax) = (100000L, 1500L)
    def ranges(w: Long, hgt: Long): Seq[Seq[StatRange]] =
      (0 until 16).map { k =>
        val x0 = (k * 36700L) % (if (w >= xMax) 1L else xMax - w)
        val y0 = (k * 541L) % (if (hgt >= yMax) 1L else yMax - hgt)
        val xs = if (w >= xMax) Seq.empty
          else Seq(LongRange("event_id", x0, x0 + w - 1))
        val ys = if (hgt >= yMax) Seq.empty
          else Seq(LongRange("user_id", y0, y0 + hgt - 1))
        xs ++ ys
      }
    val classes = Seq(
      ("box_small", ranges(8000, 120)),   // ~8% x, ~8% y
      ("box_large", ranges(25000, 375)),  // ~25% x, ~25% y
      ("box_xwide", ranges(50000, 120)),  // 50% x, 8% y — the conjunction case
      ("x_band", ranges(8000, yMax)),     // event_id-only predicate
      ("y_band", ranges(xMax, 120)))      // user_id-only predicate

    println(f"${"layout"}%-8s ${"class"}%-10s avg_files_planned (of 16)")
    for ((lname, table) <- Seq("linear" -> linear, "hilbert" -> hilbert);
         (cname, rs) <- classes) {
      val planned = rs.map(r => Snapshots.plannedFiles(spark, table, r).length)
      println(f"$lname%-8s $cname%-10s ${planned.sum.toDouble / planned.size}%6.1f")
    }
    spark.stop()
  }
}
