package graft.operators

import org.apache.spark.sql.DataFrame

/** Scale-gated scan widening for CPU-heavy narrow maps (r20, guide §2
  * "derive partitioning from input size, not a constant").
  *
  * A single-row-group parquet file plans ONE scan task no matter what
  * `maxPartitionBytes` allows, so per-row-expensive work downstream of a
  * small scan (variant/JSON parsing, vector dot products, per-doc
  * kernels) serializes on one core while the session's others idle — the
  * shape PERF_r19's scaling column flagged (the top queries barely sped
  * up from 8 → 32 cores). The fix is a round-robin repartition to the
  * session parallelism applied ONLY while the input is smaller than the
  * machine: the gate reads the ANALYZED plan's size estimate (analysis
  * already ran when the Dataset was built, so the probe is free — an
  * earlier `df.rdd.getNumPartitions` probe forced a full physical
  * planning + codegen pass per call and its driver cost exceeded the
  * win on literal-heavy plans) and widens only below `parallelism ×
  * [[BytesPerTask]]`. At production scale the estimate is TBs, the gate
  * short-circuits, and NO exchange enters the plan — this is
  * input-size-derived partitioning, not a local-mode constant.
  *
  * Round-robin changes row order, so adopters are limited to
  * order-insensitive pipelines (per-row maps, long/integer aggregates,
  * keyed windows with total orders); every adopting query is
  * oracle-gated. Unknown-size leaves (LogicalRDD checkpoints report
  * `defaultSizeInBytes` = huge) conservatively do NOT widen.
  */
private[graft] object Widen {
  /** Gate: inputs estimated under parallelism × this stay widenable —
    * 8 MB/task keeps the worst re-ship bounded by a fraction of a
    * second locally while any at-scale table (GBs+) short-circuits.
    */
  val BytesPerTask: Long = 8L << 20

  def apply(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    val bytes = df.queryExecution.analyzed.stats.sizeInBytes
    if (bytes < BigInt(p) * BytesPerTask) df.repartition(p) else df
  }
}
