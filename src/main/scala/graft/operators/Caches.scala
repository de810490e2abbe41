package graft.operators

import org.apache.spark.sql.Dataset

/** Ownership handle for the MEMORY_AND_DISK caches a multi-branch operator
  * pins internally (Catalyst does not CSE subplans, so a subplan read by
  * two union/join branches is persisted inside [[Dedup.minhashNearDupPairs]],
  * [[Dedup.simhashNearDupPairs]], [[Dedup.dedupAgainstIndex]] and
  * [[Dedup.dropRepeatedParagraphs]]).
  *
  * Lifecycle: pass a fresh tracker, materialize the operator's returned
  * plan (write/collect), then call [[release]]. The default
  * [[CacheTracker.unmanaged]] documents the alternative — handles stay
  * pinned until `spark.catalog.clearCache()` or session teardown. That is
  * fine for one-shot jobs (the dominant batch-pipeline shape) but pins
  * block-manager space per invocation in a long-lived session, so repeated
  * callers should track and release. The two-phase sampling variants
  * ([[Sampling.mixToQuotasLarge]], [[Sampling.tokenBudgetLarge]]) need no
  * tracker: they run an internal action and release their caches
  * themselves.
  */
final class CacheTracker {
  private val owned = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]

  private[operators] def own[T <: Dataset[_]](d: T): T = synchronized {
    owned += d; d
  }

  /** Unpersist every cache pinned since construction (idempotent). After
    * release the operator's returned plan must not be executed again — it
    * would still be correct but silently recompute the shared subplans
    * once per branch.
    */
  def release(): Unit = synchronized {
    owned.foreach(_.unpersist(blocking = false))
    owned.clear()
  }
}

object CacheTracker {
  /** A tracker nobody releases — the default for one-shot callers. */
  def unmanaged: CacheTracker = new CacheTracker
}
