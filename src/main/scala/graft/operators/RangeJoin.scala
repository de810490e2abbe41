package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: match points to the intervals that contain them,
  * per key — `p.key = i.key AND i.start <= p.ts <= i.end`. Spark would
  * execute the naive formulation as a broadcast-nested-loop or a per-key
  * cross product; this operator makes it a plain equi-join.
  *
  * Formulation: bin both sides by `floor(ts / binWidth)` — an interval
  * lands in every bin it overlaps (sequence-explode), a point in exactly
  * one — then equi-join on (key, bin) and re-check the exact predicate.
  * Candidate volume is |matches| + O(points in bins adjacent to interval
  * ends): shuffle-sized by the answer, not by |points| × |intervals|.
  *
  * `binWidth` tuning: fan-out per interval is `len/binWidth + 1` rows, so
  * pick binWidth ≈ the typical interval length (fan-out ~2). Intervals
  * MUCH longer than binWidth multiply the exploded side — cap or split
  * pathological intervals upstream if lengths are heavy-tailed.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keyCols: Seq[String], pointCol: String,
                      startCol: String, endCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin", floor(col(pointCol) / binWidth))
    val i = intervals.withColumn("__bin",
      explode(sequence(floor(col(startCol) / binWidth), floor(col(endCol) / binWidth))))
    p.join(i, (keyCols :+ "__bin").toSeq)
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }
}
