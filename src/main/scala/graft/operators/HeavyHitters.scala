package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Corpus-wide heavy hitters (frequent tokens) without shuffling the long
  * tail — the vocabulary-profiling pass a training-data pipeline runs to
  * find boilerplate markers, stopword inventories, and contamination
  * signatures over a 100 TB corpus whose distinct-token count is itself
  * huge.
  *
  * The naive `GROUP BY token HAVING count ≥ θ` shuffles EVERY distinct
  * token (at web scale: billions of hapax typos, ids, and hashes ship
  * through the exchange to be counted once and discarded). This operator
  * runs the classic two-pass distributed Misra–Gries instead:
  *
  *  1. Summary pass — each partition streams its tokens once through a
  *     Misra–Gries summary with `capacity` counters
  *     ([[misraGriesSummary]]; the one genuinely per-partition-imperative
  *     step, hence the `mapPartitions`), emitting its ≤ capacity
  *     candidate tokens AND its token count in the same read. MG
  *     guarantee, lifted to partitions by pigeonhole: some partition has
  *     local relative frequency ≥ the global one, so every token with
  *     global share > 1/(capacity+1) survives in at least one partition.
  *     The summary is ≤ (capacity + 1) × partitions rows — broadcastable
  *     by construction, independent of corpus size — and is PERSISTED
  *     (tiny), so the candidate-distinct branch and the total-N branch
  *     read it without re-scanning the corpus.
  *  2. Exact pass — a broadcast semi-join keeps only candidate tokens
  *     (narrow; the long tail is dropped map-side, never shuffled) and
  *     an ordinary map-side-combined count aggregates them exactly; the
  *     share threshold `cnt × denom ≥ N` is integer arithmetic against
  *     the corpus token total N (a 1-row broadcast, no driver action).
  *
  * Because pass 2 counts candidates EXACTLY and pass 1 is guaranteed to
  * contain every token at-or-above share 1/(capacity+1), the result for
  * any `1/denom > 1/(capacity+1)` equals the exact
  * `HAVING cnt·denom ≥ N` — an engine-portable contract a SQL oracle can
  * state without modeling the sketch. The corpus is scanned exactly
  * twice (summary, exact count), the minimum for exact-verified
  * sketching; both scans are token-narrow and shuffle-free below their
  * bounded aggregates.
  */
object HeavyHitters {

  /** Misra–Gries summary of one token stream: at most `capacity`
    * surviving keys, plus the stream length (counted in the same read).
    */
  private[operators] def misraGriesSummary(
      it: Iterator[String], capacity: Int): (Seq[String], Long) = {
    val counts = mutable.HashMap.empty[String, Long]
    var n = 0L
    it.foreach { t =>
      n += 1L
      if (counts.contains(t)) counts(t) += 1L
      else if (counts.size < capacity) counts(t) = 1L
      else {
        // decrement-all; drop zeros. Amortized O(1): every decrement here
        // pairs with one earlier increment, so total loop work ≤ stream
        // length regardless of how often the summary fills.
        counts.keys.toArray.foreach { k =>
          val c = counts(k) - 1L
          if (c == 0L) counts.remove(k) else counts(k) = c
        }
      }
    }
    (counts.keys.toSeq, n)
  }

  private[operators] def misraGries(
      it: Iterator[String], capacity: Int): Iterator[String] =
    misraGriesSummary(it, capacity)._1.iterator

  /** Tokens with global share ≥ 1/denom, exactly: `(token, cnt)` rows.
    * Requires `denom < capacity + 1` for the candidate guarantee (checked).
    * The bounded per-partition summary is persisted for the duration of
    * the query; pass a managed `tracker` to unpersist deterministically.
    */
  def frequentTokens(
      df: DataFrame,
      textCol: String,
      denom: Long,
      capacity: Int = 4096,
      tracker: CacheTracker = CacheTracker.unmanaged): DataFrame = {
    require(denom < capacity + 1L,
      s"denom=$denom needs capacity > denom-1 (got $capacity) for the MG guarantee")
    val spark = df.sparkSession
    import spark.implicits._
    val tokens: Dataset[String] = df
      .select(explode(
        split(lower(TextAnalysis.normWs(col(textCol))), " ")).as("token"))
      .as[String]
    // one corpus read serves both summary outputs; `null` marks the
    // per-partition count row (a real token is never null — split()
    // yields "" for empty docs, not null)
    val summary = tracker.own(tokens
      .mapPartitions { it =>
        val (cands, n) = misraGriesSummary(it, capacity)
        cands.iterator.map(c => (c, 0L)) ++ Iterator((null: String, n))
      }
      .toDF("token", "n")
      .persist(StorageLevel.MEMORY_AND_DISK))
    val candidates = summary.filter(col("token").isNotNull)
      .select("token").distinct()
    val total = summary.filter(col("token").isNull)
      .agg(sum(col("n")).as("n_total"))
    tokens.toDF("token")
      .join(broadcast(candidates), "token", "left_semi")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * denom >= col("n_total"))
      .select(col("token"), col("cnt"))
  }
}
