package graft.operators

import org.apache.spark.sql.DataFrame

/** Scale-gated scan widening for CPU-heavy narrow maps (r20, guide §2
  * "derive partitioning from input size, not a constant").
  *
  * A single-row-group parquet file plans ONE scan task no matter what
  * `maxPartitionBytes` allows, so per-row-expensive work downstream of a
  * small scan (variant/JSON parsing, per-doc signature kernels, LM
  * tokenization) serializes on one core while the session's others idle —
  * the shape PERF_r19's scaling column flagged (the top queries barely
  * sped up from 8 → 32 cores). The fix is a round-robin repartition to
  * the session parallelism applied ONLY when the plan's existing width is
  * below it: at production scale any real scan plans at least the session
  * width, the gate short-circuits, and NO exchange enters the plan — this
  * is not a local-mode constant but the input-size-derived partitioning
  * the optimization guide prescribes.
  *
  * Round-robin changes row order, so adopters are limited to
  * order-insensitive pipelines (per-row maps, long/integer aggregates,
  * keyed windows with total orders); every adopting query is
  * oracle-gated. The `df.rdd.getNumPartitions` probe plans the input once
  * on the driver (no job) — callers pass the cheapest projection that
  * still witnesses the scan width.
  */
private[graft] object Widen {
  def apply(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df else df.repartition(p)
  }
}
