package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Snapshots

/** The incremental curation step, composed END TO END from the engine's
  * already-proven incremental contracts — the shape a continuously-fed
  * training-data table actually runs:
  *
  *   1. [[Snapshots.readChangesBetween]] — consume ONLY what landed in
  *      the source table since the last consumed version (manifest-diff
  *      delta read, O(delta) cost);
  *   2. [[Dedup.dedupAgainstIndex]] — near-dup-match the delta against a
  *      standing corpus index (the index never reshuffles; the small
  *      batch broadcasts into it) and drop the matches;
  *   3. [[Expectations.gate]] — route rule-violating survivors to
  *      quarantine, clean rows onward;
  *   4. [[Snapshots.commitAppendOnce]] — land the clean rows in the
  *      destination table EXACTLY ONCE under the caller's replay token.
  *
  * Replay idempotence (the property the composition must preserve): the
  * whole step is deterministic given (source delta, index, checks), and
  * both terminal commits are token-deduplicated — so a crashed-and-
  * retried step, or a whole re-run with the same token, appends exactly
  * one generation to each sink. The quarantine commit lands FIRST: on a
  * crash between the two commits, the retry re-runs the step, finds the
  * quarantine token already present (no-op), and completes the clean
  * commit — at-least-once execution, exactly-once table effects.
  */
object IncrementalPipeline {

  /** One curation step. Returns the destination version committed, or
    * None if `token` had already landed (a replay). `sinceVersion` is
    * the last SOURCE version the previous step consumed; `index` is the
    * standing near-dup index corpus (id + text columns named as the
    * batch's).
    */
  def curateStep(spark: SparkSession, sourceTable: String, sinceVersion: Int,
                 index: DataFrame, idCol: String, textCol: String,
                 checks: Seq[Expectations.Check],
                 destTable: String, token: String,
                 quarantineTable: Option[String] = None,
                 shingleSize: Int = 3, numHashes: Int = 8): Option[Int] = {
    val delta = Snapshots.readChangesBetween(spark, sourceTable, sinceVersion)
    // step-scoped cache ownership: the dedup signature tables persist for
    // the duration of the two commits, then release — a long-running
    // caller invoking many steps must not accumulate orphaned caches
    val tracker = new CacheTracker
    try {
      val dups = Dedup.dedupAgainstIndex(index, delta, idCol, textCol,
        shingleSize, numHashes, tracker)
      curateTail(spark, delta, dups, idCol, checks, destTable, token,
        quarantineTable)
    } finally tracker.release()
  }

  /** The per-micro-batch half — what a streaming ingest runs inside
    * `foreachBatch`: the trigger's batch IS the delta, the standing
    * index arrives pre-signatured ([[Dedup.prepareDedupIndex]], computed
    * once for the stream's life), and `token` is derived from the batch
    * id so a crashed-and-replayed trigger appends nothing twice. Union
    * of per-batch results ≡ the one-shot [[curateStep]] on the same
    * rows: batches only ever match against the STANDING index (no
    * batch-vs-batch interaction) and the gate is per-row.
    */
  def curateBatch(spark: SparkSession, batch: DataFrame,
                  preparedIndex: DataFrame, idCol: String, textCol: String,
                  checks: Seq[Expectations.Check],
                  destTable: String, token: String,
                  quarantineTable: Option[String] = None,
                  shingleSize: Int = 3, numHashes: Int = 8): Option[Int] = {
    // trigger-scoped cache ownership (the q_stream_dedup discipline):
    // only the BATCH side is signatured here — without a release per
    // trigger, a long-running stream accumulates one orphaned persisted
    // table per micro-batch
    val tracker = new CacheTracker
    try {
      val dups = Dedup.dedupAgainstPreparedIndex(preparedIndex, batch,
        idCol, textCol, shingleSize, numHashes, tracker)
      curateTail(spark, batch, dups, idCol, checks, destTable, token,
        quarantineTable)
    } finally tracker.release()
  }

  private def curateTail(spark: SparkSession, delta: DataFrame,
                         dups: DataFrame, idCol: String,
                         checks: Seq[Expectations.Check],
                         destTable: String, token: String,
                         quarantineTable: Option[String]): Option[Int] = {
    val fresh = delta.join(dups.select(idCol), Seq(idCol), "left_anti")
    val (clean, dirty) = Expectations.gate(fresh, checks)
    quarantineTable.foreach { qt =>
      Snapshots.commitAppendOnce(spark, qt, dirty, token)
    }
    Snapshots.commitAppendOnce(spark, destTable, clean, token)
  }
}
