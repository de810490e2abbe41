package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers.
  *
  * AQE's skew-join splitting handles joins; for AGGREGATIONS over a
  * hot key (one key holding 10% of 100 TB lands on one reducer), the
  * standard fix is salting: split each key into `saltBuckets` sub-keys,
  * aggregate partially per sub-key (parallel), then merge the partials
  * (tiny). Works for any algebraic aggregate (sum/count/min/max —
  * anything with an associative merge).
  */
object Skew {

  /** Two-stage salted aggregation.
    *
    * @param partialAggs stage-1 aggregates over the salted sub-keys
    * @param mergeAggs   stage-2 merge of the stage-1 partial columns
    *                    (column names must line up)
    * {{{
    * Skew.saltedAggregate(df, Seq("user_id"), 16,
    *   partialAggs = Seq(count(lit(1)).as("n"), sum($"value").as("s")),
    *   mergeAggs   = Seq(sum($"n").as("n"), sum($"s").as("s")))
    * }}}
    */
  def saltedAggregate(df: DataFrame, keyCols: Seq[String], saltBuckets: Int,
                      partialAggs: Seq[Column], mergeAggs: Seq[Column]): DataFrame = {
    // per-row salt from hash(monotonically_increasing_id()): unique per
    // row within the job, so a hot key's rows spread uniformly across all
    // saltBuckets reducers even when they arrive co-located in one input
    // partition. Row-identity salting is safe ONLY because the aggregates
    // are algebraic (stage 2 merges partials regardless of how rows were
    // split); it is NOT usable for joins, which need a key-deterministic
    // salt on both sides.
    val salted = df.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(saltBuckets)))
    val stage1 = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    stage1
      .groupBy(keyCols.map(col): _*)
      .agg(mergeAggs.head, mergeAggs.tail: _*)
  }
}
