package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact all-pairs cosine similarity self-join over binary shingle sets
  * with prefix filtering — Bayardo, Ma & Srikant, "Scaling Up All Pairs
  * Similarity Search" (WWW 2007). The sparse-vector complement to the
  * MinHash/SimHash tier: those are probabilistic recall knobs; this is
  * EXACT "every pair with cosine ≥ t, nothing else" — the tool for the
  * final adjudication pass or for corpora where a missed duplicate is
  * not acceptable.
  *
  * For binary sets A, B:  cos(A,B) = |A∩B| / √(|A|·|B|), so
  * cos ≥ t  ⇔  10⁶·|A∩B|² ≥ t‰²·|A|·|B| — the verify is pure BIGINT
  * arithmetic; no float (and no √) ever enters, so any engine replays
  * the result bit-for-bit.
  *
  * Why not the naive join-on-any-shared-element: common elements make
  * it quadratic. Prefix filtering makes the candidate join near-linear
  * on Zipfian data:
  *
  *   1. Rank every element by GLOBAL document frequency, rarest first
  *      (ties by value) — one grouped count.
  *   2. Sort each doc's set by that rank and let only its PREFIX of
  *      length p(x) = |x| − ⌈t²·|x|⌉ + 1 enter the join. The most
  *      common elements live at the END of the ranked order, so they
  *      never generate candidates unless a doc consists of almost
  *      nothing else.
  *   3. Size filter at the join: a valid pair needs
  *      10⁶·min(|A|,|B|) ≥ t‰²·max(|A|,|B|).
  *   4. Dedup candidates to (id_a, id_b) — NARROW, before any payload
  *      — then verify exactly on the two ranked arrays.
  *
  * Soundness of the prefix: the classic lemma — under one total element
  * order, |A∩B| ≥ α forces the (|A|−α+1)-prefixes of A and B to share
  * an element (fewer than α elements remain outside either prefix). A
  * pair at threshold has overlap α(A,B) = ⌈t·√(|A|·|B|)⌉, and with the
  * size filter (wlog |A| ≤ |B|, so |A| ≥ t²·|B|):
  * t·√(|A|·|B|) ≥ t·√(t²·|B|²) = t²·|B| ≥ t²·|x| for BOTH sides, so
  * indexing each side's (|x| − ⌈t²·|x|⌉ + 1)-prefix misses nothing.
  * Ceilings are computed as (num + den − 1) div den — exact.
  *
  * Scale shape: one element-df exchange (map-side-combinable count),
  * one per-doc exchange to assemble the ranked set (sort_array of
  * collect_list — deterministic, (df, element) is unique per doc), the
  * candidate self-equi-join on prefix elements (the frequency ranking
  * is exactly what bounds per-key fanout), a pair-dedup exchange
  * carrying only ids + sizes, and two id-equi-joins to fetch the ranked
  * arrays for the verify. Document payloads are never shuffled — output
  * carries ids + integer evidence, re-attachable by id.
  *
  * Shingling: pass `shingleSize` > 1 to compare word-k-gram sets
  * (reuses [[Dedup.explodedShingles]]' codegen'd window formulation).
  * Unigram sets only make sense for vocabulary-rich elements; k ≥ 3
  * shingles are what near-dup adjudication wants.
  */
object AllPairs {

  /** All unordered pairs (id_a < id_b) whose binary-shingle-set cosine
    * is ≥ tPerMille/1000. Output: (id_a, id_b, n_a, n_b, n_common) —
    * all BIGINT. `idCol` must be unique per row.
    */
  def cosinePairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      tPerMille: Int,
      shingleSize: Int = 1): DataFrame = {
    val elems = Dedup.explodedShingles(docs, idCol, textCol, shingleSize)
      .select(col(idCol).as("__id"), col("__sh").as("__el"))
      .distinct()
    cosinePairsOnElements(elems, tPerMille)
  }

  /** Core on pre-exploded (doc id, set element) rows — columns must be
    * named (__id, __el) and be distinct pairs. See [[cosinePairs]].
    */
  private[operators] def cosinePairsOnElements(
      elems: DataFrame,
      tPerMille: Int): DataFrame = {
    require(tPerMille > 0 && tPerMille < 1000,
      s"threshold must be in (0, 1000) per-mille, got $tPerMille")
    val t2 = tPerMille.toLong * tPerMille // t²·10⁶
    val M = 1000000L

    // global document frequency -> total order (df asc, element asc)
    val elDf = elems.groupBy("__el").agg(count(lit(1)).as("__df"))

    // ranked set per doc + its prefix: p = n - ceil(t²·n/10⁶) + 1
    val ranked = elems.join(elDf, "__el")
      .groupBy("__id")
      .agg(sort_array(collect_list(struct(col("__df"), col("__el")))).as("__r"))
      .select(col("__id"),
        size(col("__r")).cast("long").as("__n"),
        transform(col("__r"), e => e("__el")).as("__ranked"))
    val prefixed = ranked.select(col("__id"), col("__n"),
      slice(col("__ranked"), lit(1),
        expr(s"cast(__n - (($t2 * __n + ${M - 1}) div $M) + 1 as int)"))
        .as("__prefix"))

    // candidates: prefix-element equi-join + size filter, dedup to id pairs
    val l = prefixed.select(col("__id").as("id_a"), col("__n").as("n_a"),
      explode(col("__prefix")).as("__el"))
    val r = prefixed.select(col("__id").as("id_b"), col("__n").as("n_b"),
      explode(col("__prefix")).as("__el"))
    val cand = l.join(r, Seq("__el"))
      .filter(col("id_a") < col("id_b"))
      .filter(lit(M) * least(col("n_a"), col("n_b")) >=
        lit(t2) * greatest(col("n_a"), col("n_b")))
      .select("id_a", "id_b", "n_a", "n_b")
      .distinct()

    // exact verify on the full (ranked) sets
    cand
      .join(ranked.select(col("__id").as("id_a"), col("__ranked").as("__ta")), "id_a")
      .join(ranked.select(col("__id").as("id_b"), col("__ranked").as("__tb")), "id_b")
      .select(col("id_a"), col("id_b"), col("n_a"), col("n_b"),
        size(array_intersect(col("__ta"), col("__tb"))).cast("long").as("n_common"))
      .filter(lit(M) * col("n_common") * col("n_common") >=
        lit(t2) * col("n_a") * col("n_b"))
  }
}
