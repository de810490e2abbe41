package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-aggregate maintenance with RETRACTIONS —
  * the pre-aggregated-rollup refresh every reporting/feature pipeline
  * runs: instead of recomputing `GROUP BY keys` over the whole fact
  * table each cycle, fold a small signed delta into the stored
  * aggregate rows (the retraction-stream model: an updated fact emits
  * retract-old + add-new, a deleted fact emits retract-old).
  *
  * Contract: the MV carries additive aggregates only — per-key SUMs
  * plus a row-count column (`COUNT(*)` is `SUM(1)`; AVG is a derived
  * sum/count; MIN/MAX/COUNT DISTINCT are NOT additive under retraction
  * and are deliberately out of contract — a retracted MAX cannot be
  * repaired without the base table). Delta rows share the MV schema
  * with NEGATED measures for retractions.
  *
  * The classic MV bug this operator refuses to have: a group whose
  * facts are ALL retracted must VANISH from the view, not linger as a
  * zero-count row (it would resurrect wrongly on the next insert's
  * merge and poison `COUNT(group)` readers). `applyDelta` drops
  * count ≤ 0 groups; [[Scd2]]-style composition through storage is
  * pinned by the driver query's recompute oracle.
  *
  * Scale shape: ONE key-hash exchange over `stored ∪ delta` — both
  * sides enter a map-side-combinable sum aggregate, so the stored MV
  * rows (bounded by group cardinality, not fact count) and the
  * delta (bounded by the change batch) shuffle once each; the fact
  * table itself is never touched. A join-based merge would shuffle
  * both sides too but lose partial aggregation and need an extra
  * null-handling pass for new groups.
  */
object IncrementalAgg {

  /** Fold a signed `delta` into the stored MV. Both inputs share the
    * schema `keys ++ sumCols ++ countCol`; groups whose resulting
    * count is ≤ 0 vanish.
    */
  def applyDelta(stored: DataFrame, delta: DataFrame, keys: Seq[String],
                 sumCols: Seq[String], countCol: String): DataFrame = {
    val measures = sumCols :+ countCol
    require(measures.distinct == measures && keys.intersect(measures).isEmpty,
      s"keys $keys and measures $measures must be distinct column sets")
    val aggs = measures.map(c => sum(col(c)).as(c))
    stored.unionByName(delta.select(stored.columns.map(col): _*))
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .filter(col(countCol) > 0)
  }

  /** Build the signed delta for a fact UPDATE/DELETE batch: retract the
    * old fact rows, add the new ones (pass an empty `newFacts` for pure
    * deletes). Facts are single rows, so each contributes count ±1 and
    * its measure values ±; the result is already combined per key.
    */
  def retractionDelta(oldFacts: DataFrame, newFacts: DataFrame,
                      keys: Seq[String], sumCols: Seq[String],
                      countCol: String): DataFrame = {
    def signed(f: DataFrame, sign: Int) = f.select(
      keys.map(col) ++ sumCols.map(c => (col(c) * sign).as(c)) :+
        lit(sign.toLong).as(countCol): _*)
    signed(oldFacts, -1).unionByName(signed(newFacts, 1))
      .groupBy(keys.map(col): _*)
      .agg(sum(col(sumCols.head)).as(sumCols.head),
        (sumCols.tail.map(c => sum(col(c)).as(c)) :+
          sum(col(countCol)).as(countCol)): _*)
  }
}
