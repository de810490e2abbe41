package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximate analytics — the 100 TB answer when exact
  * distinct/frequency is unaffordable. All of it composes Spark
  * built-ins (HyperLogLog++, CountMinSketch, BloomFilter) rather than
  * reimplementing them: the sketches merge associatively, so every one of
  * these is a single map-side-combined aggregation.
  */
object Sketches {

  /** Per-group approximate distinct count (HyperLogLog++). `rsd` is the
    * target relative standard deviation (default matches Spark's 5%);
    * state per group is the ~kilobyte HLL register array, NOT the value
    * set — the reason this works on 100 TB where exact distinct cannot.
    */
  def approxDistinctByGroup(df: DataFrame, groupCol: String, valueCol: String,
                            rsd: Double = 0.05): DataFrame =
    df.groupBy(col(groupCol))
      .agg(approx_count_distinct(col(valueCol), rsd).as("approx_distinct"),
        count(lit(1)).as("n_rows"))

  /** [[approxDistinctByGroup]] audited against the exact count in one
    * query: emits per group the exact distinct, row count, and a boolean
    * `within_rsd` = |approx − exact| ≤ `tolerance`·rsd·exact. The approx
    * VALUE itself is engine-internal (HLL++ register hashing differs per
    * engine) and deliberately not emitted — the portable contract is the
    * bound, so a cross-engine oracle expects every group TRUE and any
    * estimator drift breaks a hash compare instead of hiding in a
    * rows-only check. The exact count is benchmark scaffolding: at
    * 100 TB you run only the sketch; this shape exists to PROVE the
    * sketch's bound where exact is still affordable.
    */
  def approxDistinctAudit(df: DataFrame, groupCol: String, valueCol: String,
                          rsd: Double = 0.05, tolerance: Double = 3.0): DataFrame =
    df.groupBy(col(groupCol))
      .agg(approx_count_distinct(col(valueCol), rsd).as("__approx"),
        countDistinct(col(valueCol)).as("exact_distinct"),
        count(lit(1)).as("n_rows"))
      .select(col(groupCol), col("exact_distinct"), col("n_rows"),
        (abs(col("__approx") - col("exact_distinct")).cast("double") <=
          lit(tolerance * rsd) * col("exact_distinct")).as("within_rsd"))

  /** Point estimates for `items` frequencies from ONE CountMinSketch pass
    * (`eps` relative error over the stream length, `confidence` the
    * probability bound). The sketch is built distributed (merged across
    * partitions) and only the fixed-size table reaches the driver.
    * Estimates are biased high, never low — the CMS guarantee.
    */
  def cmsEstimates(df: DataFrame, valueCol: String, items: Seq[String],
                   eps: Double = 0.001, confidence: Double = 0.99,
                   seed: Int = 42): Map[String, Long] = {
    val sketch = df.stat.countMinSketch(valueCol, eps, confidence, seed)
    items.map(i => i -> sketch.estimateCount(i)).toMap
  }

  /** Pre-filter the big side of a join with a Bloom filter built from the
    * small side's keys: rows that cannot match are dropped BEFORE the
    * shuffle, which is where a selective 100 TB join spends its time.
    * False positives only (`fpp`) — surviving non-matches are removed by
    * the real join, so results are exact; the filter is a broadcast-sized
    * bitmap regardless of big-side volume.
    */
  def bloomPrefilter(big: DataFrame, bigKeyCol: String,
                     small: DataFrame, smallKeyCol: String,
                     expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StringType}
    val bloom = small.stat.bloomFilter(smallKeyCol, expectedItems, fpp)
    val bloomBc = big.sparkSession.sparkContext.broadcast(bloom)
    // the membership probe is a genuine per-row library call (Spark's own
    // runtime bloom pushdown is engine-internal), so a typed UDF is the
    // sanctioned island here; when the small side fits a broadcast, a
    // left_semi broadcast join is the exact-filter alternative
    val probe: Column = big.schema(bigKeyCol).dataType match {
      case LongType => udf((k: java.lang.Long) =>
        k != null && bloomBc.value.mightContainLong(k)).apply(col(bigKeyCol))
      case StringType => udf((k: String) =>
        k != null && bloomBc.value.mightContainString(k)).apply(col(bigKeyCol))
      case other => throw new IllegalArgumentException(
        s"bloomPrefilter supports long/string keys, got $other")
    }
    big.filter(probe)
  }
}
