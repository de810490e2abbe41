package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distribution statistics over integer-valued columns —
  * engine-portable by construction (never interpolates, never emits a
  * float): the complement of `q_profile`'s interpolating
  * `percentile`/sketch path.
  */
object Stats {

  /** Exact lower-discrete quantiles per key in ONE sort-shuffle: for each
    * probe p, the element of `valCol` at sorted index floor((n-1)·p).
    * Returns existing values (BIGINT in, BIGINT out) — no interpolation,
    * so results hash-match across engines.
    *
    * Shape at scale: a single exchange on `keyCol` satisfies the rank
    * window, the count window, AND the final aggregate (all key-clustered)
    * — the sort inside each key group is the unavoidable cost of an exact
    * quantile. For extreme group cardinality where a per-key sort is too
    * much, the sketch path (`percentile_approx`) is the alternative; this
    * is the exact path.
    */
  def discreteQuantilesByKey(df: DataFrame, keyCol: String, valCol: String,
                             ps: Seq[(String, Double)]): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p >= 0.0 && p <= 1.0 })
    val byKey = Window.partitionBy(keyCol)
    // NULLs are excluded up front (standard quantile semantics, matching
    // DuckDB/ANSI aggregate NULL handling) — leaving them in would also
    // make the rank indexes engine-dependent: Spark orders NULLS FIRST
    // ascending, DuckDB NULLS LAST
    val ranked = df.select(col(keyCol), col(valCol))
      .filter(col(valCol).isNotNull)
      .withColumn("__rn", row_number().over(byKey.orderBy(col(valCol))))
      .withColumn("__n", count(lit(1)).over(byKey))
    // both engines compute floor((n-1)·p) in binary64 — identical results
    val aggs = ps.map { case (name, p) =>
      max(when(col("__rn") === floor((col("__n") - 1) * lit(p)) + 1,
        col(valCol))).as(name)
    }
    ranked.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Contiguous global ordinals 0..n-1 in `orderCol` order WITHOUT the
    * single-partition global window: `row_number() OVER (ORDER BY ...)`
    * funnels the entire table through one task — the canonical 100 TB
    * scale-killer for sample indexing. This is the two-phase zipWithIndex
    * pattern instead: range-repartition on the order key (so partition i
    * holds a contiguous key range), sort within partitions, then add each
    * partition's start offset (one bounded count job over partition
    * SIZES, never rows to the driver) to the partition-local index.
    *
    * Deterministic for a unique `orderCol` regardless of where the range
    * boundaries land: the ordinal is the global rank by key, and rank is
    * boundary-placement-independent. The per-partition imperative index
    * is the one genuinely RDD-shaped step in the engine (Spark's own
    * `zipWithIndex`); everything before and after stays columnar.
    */
  def globalOrdinals(df: DataFrame, orderCol: String,
                     partitions: Int): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.LongType
    val sorted = df.repartitionByRange(partitions, col(orderCol))
      .sortWithinPartitions(orderCol)
    val schema = sorted.schema.add("ordinal", LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    sorted.sparkSession.createDataFrame(rdd, schema)
  }

  /** Per-group rank calibration in per-mille: each row's rank position
    * within its group, scaled to [0, 1000] — rank_pm = (1000·(rank−1))
    * div (n−1), a single-member group calibrating to 0. The
    * cross-source score-normalization move: raw quality scores are NOT
    * comparable across sources (each source has its own score
    * distribution), so a single global cutoff over raw scores silently
    * over-prunes whole sources; rank-within-source makes "keep the top
    * X‰ of EACH source" one comparable predicate. Integer arithmetic
    * end to end (percent_rank would hand every replaying engine a
    * float); ties broken by `tieCol` so ranks are total and
    * deterministic. One (group)-keyed exchange, both windows sharing
    * its sort.
    */
  def rankCalibrate(df: DataFrame, groupCol: String, scoreCol: String,
                    tieCol: String): DataFrame = {
    require(!df.columns.contains("rank_pm"),
      "input already has a 'rank_pm' column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col(scoreCol).desc, col(tieCol))
    val n = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
    df.withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(n))
      .withColumn("rank_pm",
        expr("CASE WHEN __n = 1 THEN 0 ELSE (1000 * (__rn - 1)) div (__n - 1) END"))
      .drop("__rn", "__n")
  }

  /** Fixed-width histogram: bucket = clamp(val div width, 0, nBuckets-1)
    * — the overflow tail lands in the last bucket, values below zero in
    * bucket 0 (the double clamp also absorbs the truncate-vs-floor
    * integer-division difference between engines on negative inputs:
    * every negative value clamps to 0 either way). Pure integer
    * arithmetic → engine-exact; one map-side-combined aggregation over at
    * most nBuckets output rows regardless of input scale.
    */
  def histogram(df: DataFrame, valCol: String, width: Long,
                nBuckets: Int): DataFrame = {
    require(width > 0 && nBuckets > 0)
    df.select(greatest(least(expr(s"$valCol div $width"), lit(nBuckets - 1L)),
        lit(0L)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
  }
}
