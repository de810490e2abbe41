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
    val fuzzy = FuzzyJoin.fuzzyJoin(a, b, "str_a", "str_b", maxEdit)
      .filter(col("str_a") < col("str_b"))
      .select(col("str_a"), col("str_b"), col("dist").cast("int").as("dist"),
        lit(1).as("via_fuzzy"), lit(0).as("via_phonetic"))
    val phonetic = Phonetic.phoneticJoin(a, b, "str_a", "str_b", maxPhoneticDist)
      .filter(col("str_a") < col("str_b"))
      .select(col("str_a"), col("str_b"), col("dist").cast("int").as("dist"),
        lit(0).as("via_fuzzy"), lit(1).as("via_phonetic"))
    fuzzy.unionByName(phonetic)
      .groupBy(col("str_a"), col("str_b"))
      .agg(min(col("dist")).as("dist"),
        max(col("via_fuzzy")).as("via_fuzzy"),
        max(col("via_phonetic")).as("via_phonetic"))
  }

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
