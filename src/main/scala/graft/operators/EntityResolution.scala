package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-evidence entity resolution — the production composition on top
  * of the engine's three blocking primitives: [[FuzzyJoin]]'s
  * edit-distance deletion-neighborhood, [[Phonetic]]'s sound-alike key
  * equality, and an embedding-similarity channel ([[Similarity]]'s
  * quantized vectors). One blocking pass alone mis-handles real name
  * data: edit-distance blocking admits one-letter-apart but DIFFERENT
  * entities ("nmab"/"nmaf") and misses multi-edit systematic variants
  * (vowel tails), phonetic keys collapse sound-alike strangers, and
  * embeddings alone have no blocking story (all-pairs). The production
  * shape is: union the CANDIDATES from every cheap blocking pass, score
  * each candidate with EVERY evidence channel, calibrate scores per
  * provenance ([[Stats.rankCalibrate]] — raw scores are not comparable
  * across passes), threshold, and resolve with connected components.
  *
  * Scale shape: everything here follows FuzzyJoin's distinct-strings
  * discipline — pair generation runs over each side's DISTINCT strings
  * (the name universe, orders of magnitude below the record count);
  * records re-attach by string equality at the end. Evidence vectors
  * join in by entity key; the scoring joins are narrow-keyed.
  */
object EntityResolution {

  /** Candidate entity pairs over the DISTINCT strings of `strCol`, from
    * the union of two blocking passes:
    *
    *   - `via_fuzzy = 1`: within `maxEdit` edits ([[FuzzyJoin]]'s
    *     deletion-neighborhood blocking — exact for its budget);
    *   - `via_phonetic = 1`: equal phonetic key AND within
    *     `maxPhoneticDist` edits ([[Phonetic.phoneticJoin]] — catches
    *     the systematic sound-preserving variants a small edit budget
    *     misses).
    *
    * Output: (`str_a`, `str_b`, `dist`, `via_fuzzy`, `via_phonetic`)
    * with `str_a < str_b` (binary order) and `dist` the exact
    * levenshtein distance. A pair surfaced by both passes appears ONCE
    * with both flags set.
    */
  def candidatePairs(strings: DataFrame, strCol: String,
                     maxEdit: Int = 1, maxPhoneticDist: Int = 2): DataFrame = {
    val ss = strings.select(col(strCol)).filter(col(strCol).isNotNull).distinct()
    val a = ss.select(col(strCol).as("str_a"))
    val b = ss.select(col(strCol).as("str_b"))
    // string-pairs faces, not the payload joins (r20): both sides here
    // are the same DISTINCT name universe, so fuzzyJoin/phoneticJoin's
    // payload re-attach would be an identity join per side — two join
    // stages per blocking pass carrying nothing, at any scale
    val fuzzy = FuzzyJoin.fuzzyStringPairs(a, b, "str_a", "str_b", maxEdit,
        "str_a", "str_b", dedup = false) // the groupBy below dedups
      .filter(col("str_a") < col("str_b"))
      .select(col("str_a"), col("str_b"), col("dist").cast("int").as("dist"),
        lit(1).as("via_fuzzy"), lit(0).as("via_phonetic"))
    val phonetic = Phonetic.phoneticStringPairs(a, b, "str_a", "str_b",
        maxPhoneticDist, "str_a", "str_b")
      .filter(col("str_a") < col("str_b"))
      .select(col("str_a"), col("str_b"), col("dist").cast("int").as("dist"),
        lit(0).as("via_fuzzy"), lit(1).as("via_phonetic"))
    fuzzy.unionByName(phonetic)
      .groupBy(col("str_a"), col("str_b"))
      .agg(min(col("dist")).as("dist"),
        max(col("via_fuzzy")).as("via_fuzzy"),
        max(col("via_phonetic")).as("via_phonetic"))
  }

  /** The INCREMENTAL half of [[candidatePairs]]: candidate pairs where
    * at least one side is NEW — (new strings) × (standing ∪ new
    * strings) through both blocking passes — so an ER system folding a
    * delta in pays candidate generation proportional to the DELTA's
    * name universe, not the standing one. Exact complement law (pinned
    * by EntityResolutionSpec over random splits): for any partition of
    * the name universe into (standing, fresh),
    *
    * {{{
    *   candidatePairs(all) ≡ candidatePairs(standing)
    *                        ∪ candidatePairsIncrement(standing, fresh)
    * }}}
    *
    * because both blocking passes are EXACT for their predicates (a
    * deletion-neighborhood join finds every pair within the edit
    * budget; a phonetic join every key-equal pair), and every pair
    * either has both sides standing (left term) or touches a new
    * string (right term). Fresh strings already present in `standing`
    * are dropped (they contribute no pair the left term lacks). Same
    * output shape as [[candidatePairs]].
    *
    * Downstream caveat the caller owns: a POPULATION-dependent keep
    * criterion (e.g. [[Stats.rankCalibrate]] percentiles) must re-run
    * over the UNION of standing + incremental scored pairs — the pair
    * LEDGER is small (it is the blocking that is expensive); with an
    * absolute threshold instead, [[mergeComponents]] absorbs the new
    * edges into the standing labeling directly.
    */
  def candidatePairsIncrement(standing: DataFrame, fresh: DataFrame,
                              strCol: String, maxEdit: Int = 1,
                              maxPhoneticDist: Int = 2): DataFrame = {
    val s = standing.select(col(strCol)).filter(col(strCol).isNotNull).distinct()
    val n = fresh.select(col(strCol)).filter(col(strCol).isNotNull).distinct()
      .join(s, Seq(strCol), "left_anti")
    val all = s.unionByName(n)
    def oriented(pairs: DataFrame, fuzzyFlag: Int): DataFrame = pairs
      .filter(col("__er_l") =!= col("__er_r"))
      .select(least(col("__er_l"), col("__er_r")).as("str_a"),
        greatest(col("__er_l"), col("__er_r")).as("str_b"),
        col("dist").cast("int").as("dist"),
        lit(fuzzyFlag).as("via_fuzzy"), lit(1 - fuzzyFlag).as("via_phonetic"))
    val nl = n.select(col(strCol).as("__er_l"))
    val ar = all.select(col(strCol).as("__er_r"))
    // string-pairs faces: both sides are distinct name projections —
    // see candidatePairs (r20)
    val fuzzy = oriented(
      FuzzyJoin.fuzzyStringPairs(nl, ar, "__er_l", "__er_r", maxEdit,
        "__er_l", "__er_r", dedup = false), 1) // the groupBy below dedups
    val phonetic = oriented(
      Phonetic.phoneticStringPairs(nl, ar, "__er_l", "__er_r",
        maxPhoneticDist, "__er_l", "__er_r"), 0)
    // a new-new pair surfaces from both orientations (and possibly both
    // passes): the group-by collapses it to ONE row with merged flags,
    // exactly candidatePairs' output contract
    fuzzy.unionByName(phonetic)
      .groupBy(col("str_a"), col("str_b"))
      .agg(min(col("dist")).as("dist"),
        max(col("via_fuzzy")).as("via_fuzzy"),
        max(col("via_phonetic")).as("via_phonetic"))
  }

  /** Union-find ABSORB: fold new edges into an existing labeling
    * without recomputing components from the original edge set. An
    * existing labeling is an equivalence quotient of its edges, so
    * components over (label edges ∪ new edges) equal components over
    * (original edges ∪ new edges) — the law ComponentsSpec would state,
    * pinned here over random edge splits. Output: (id, component) for
    * every id in `labels` or touched by `newEdges`, component = min
    * reachable id (the [[Components.connectedComponents]] convention,
    * which keeps labels STABLE under absorption: a component's label
    * only ever decreases when a new edge bridges it to a smaller one).
    * Use when the keep criterion is population-independent; a
    * recalibrated threshold needs the re-resolve path instead (see
    * [[candidatePairsIncrement]]).
    */
  def mergeComponents(labels: DataFrame, newEdges: DataFrame,
                      aCol: String, bCol: String): DataFrame =
    Components.connectedComponents(
      labels.select(col("id").as(aCol), col("component").as(bCol))
        .unionByName(newEdges.select(col(aCol), col(bCol))),
      aCol, bCol)

  /** Combine the three evidence channels into ONE deterministic integer
    * score: exact edit distance dominates (band width 10⁷), phonetic
    * agreement breaks distance ties (3·10⁶), and the embedding cosine
    * (per-mille, ∈ [-1000, 1000]) orders within a (dist, phonetic)
    * band — the channel that separates one-letter-apart STRANGERS from
    * true variants, which no string evidence can. `maxDist` anchors the
    * distance band (score stays positive for dist ≤ maxDist).
    */
  def evidenceScore(dist: Column, viaPhonetic: Column, cosPm: Column,
                    maxDist: Int = 2): Column =
    lit(10000000L) * (lit(maxDist.toLong) - dist) +
      lit(3000000L) * viaPhonetic.cast("long") + cosPm.cast("long")

  /** Expand name-level components to record-level families: each record
    * joins its string's component; strings without a surviving edge are
    * their own singleton family (labeled by the string's canonical id).
    * `nameIds` maps each distinct string to its canonical LONG id
    * (conventionally the min record id carrying it); `components` is
    * [[Components.connectedComponents]] output over those ids. Output =
    * `records` plus a `family` column.
    */
  def labelFamilies(records: DataFrame, strCol: String,
                    nameIds: DataFrame, nameIdCol: String,
                    components: DataFrame): DataFrame = {
    val nid = nameIds.select(col(strCol).as("__er_str"), col(nameIdCol).as("__er_nid"))
    records
      .join(nid, records(strCol) === col("__er_str"))
      .join(components.select(col("id").as("__er_nid"), col("component")),
        Seq("__er_nid"), "left")
      .withColumn("family", coalesce(col("component"), col("__er_nid")))
      .drop("__er_str", "__er_nid", "component")
  }
}
