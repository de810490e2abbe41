package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

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

  /** Seed a standing dedup-index SNAPSHOT TABLE from the corpus: one
    * [[Dedup.minhashSignatureMd5WithSets]] row per document (signature
    * lanes + exact shingle set), committed through the table format so
    * the index itself gets time travel, exactly-once accretion and
    * incremental reads. Returns the index table's version.
    */
  def initDedupIndex(spark: SparkSession, indexTable: String, corpus: DataFrame,
                     idCol: String, textCol: String,
                     shingleSize: Int = 3, numHashes: Int = 8): Int =
    Snapshots.commitOverwrite(spark, indexTable,
      Dedup.minhashSignatureMd5WithSets(corpus, idCol, textCol,
        shingleSize, numHashes))

  /** [[curateStep]] with an ACCRETING standing index: the index lives as
    * its own snapshot table ([[initDedupIndex]]), the delta is matched
    * against its head, and — after the clean rows land — the ACCEPTED
    * rows' signatures append to the index under the SAME token, so the
    * NEXT step's near-dups of this step's accepted rows are caught
    * (the fixed-index [[curateStep]] lets every cross-batch near-dup
    * through). Accretion law: step k matches against
    * index₀ ∪ signatures(accepted batches 1..k-1) — quarantined and
    * deduped rows never accrete (they are not in the corpus, so a later
    * clean near-dup of one SHOULD land). Sequential steps are therefore
    * ≡ the by-hand fold that re-seeds a fixed index from
    * corpus ∪ accepted-so-far before each batch (IncrementalPipelineSpec
    * pins this over random batch splits).
    *
    * Crash ordering extends [[curateStep]]'s: quarantine → destination →
    * index, all under one token. A crash between destination and index
    * leaves the index one commit behind; the retry re-runs the
    * (deterministic) match against the UNCHANGED index, no-ops the first
    * two commits, and completes the accretion — exactly-once effects on
    * all three tables. The reverse order could dedup a future batch
    * against rows that never landed.
    *
    * Scale shape: the index table is read as plain parquet (columnar,
    * never reshuffled — the batch's bands broadcast into it, exactly the
    * [[Dedup.dedupAgainstPreparedIndex]] plan) and accretion appends
    * O(batch) signature rows through the O(delta) segment commit path.
    */
  def curateStepAccreting(spark: SparkSession, sourceTable: String,
                          sinceVersion: Int, indexTable: String,
                          idCol: String, textCol: String,
                          checks: Seq[Expectations.Check],
                          destTable: String, token: String,
                          quarantineTable: Option[String] = None,
                          toVersion: Option[Int] = None,
                          shingleSize: Int = 3, numHashes: Int = 8): Option[Int] =
    curateBatchAccreting(spark,
      Snapshots.readChangesBetween(spark, sourceTable, sinceVersion, toVersion),
      indexTable, idCol, textCol, checks, destTable, token,
      quarantineTable, shingleSize, numHashes)

  /** The delta-as-DataFrame half of [[curateStepAccreting]] — what a
    * CHANGELOG CONSUMER'S tick callback runs
    * ([[graft.sources.Snapshots.consumeChanges]] hands it exactly
    * (delta, token)), and what a `foreachBatch` trigger would run with a
    * batch-id token. All three commits — quarantine, destination, index
    * accretion — are token-idempotent, which is precisely the
    * callback contract the consumer's exactly-once recovery requires.
    */
  def curateBatchAccreting(spark: SparkSession, delta: DataFrame,
                           indexTable: String, idCol: String, textCol: String,
                           checks: Seq[Expectations.Check],
                           destTable: String, token: String,
                           quarantineTable: Option[String] = None,
                           shingleSize: Int = 3, numHashes: Int = 8): Option[Int] = {
    val idx = Snapshots.read(spark, indexTable)
    val tracker = new CacheTracker
    try {
      val bat = tracker.own(
        Dedup.minhashSignatureMd5WithSets(delta, idCol, textCol,
          shingleSize, numHashes)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val dups = Dedup.dedupPreparedPair(idx, bat, idCol, numHashes)
      val fresh = delta.join(dups.select(idCol), Seq(idCol), "left_anti")
      val (clean, dirty) = Expectations.gate(fresh, checks)
      quarantineTable.foreach { qt =>
        Snapshots.commitAppendOnce(spark, qt, dirty, token)
      }
      val destVersion = Snapshots.commitAppendOnce(spark, destTable, clean, token)
      // accrete the ACCEPTED rows' already-computed signatures — the
      // semi join re-derives the gate+dedup decision from the persisted
      // batch signatures, so nothing is re-shingled
      val acceptedSigs = bat.join(clean.select(col(idCol)), Seq(idCol), "left_semi")
      Snapshots.commitAppendOnce(spark, indexTable, acceptedSigs, token)
      destVersion
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
