package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance similarity join with deletion-neighborhood blocking —
  * the entity-resolution primitive (typo-variant mining, near-identical
  * title/name linkage) that a naive formulation makes a cross join.
  *
  * Exactness: two strings with `ed(u, v) <= d` can always be brought to a
  * COMMON string by deleting at most `d` characters from each (the
  * SymSpell/FastSS principle: delete the edited positions of an optimal
  * alignment from both sides). So the candidate set "pairs sharing at
  * least one key in their d-deletion neighborhoods" is a SUPERSET of the
  * true result, and a per-candidate `levenshtein` verification (the
  * banded threshold variant — O(d·n) per pair, codegen'd) makes the join
  * exact: no pair within distance d is ever missed, no pair beyond it
  * survives.
  *
  * Scale shape: each row expands to its neighborhood keys (|s|+1 keys at
  * d=1, O(|s|²/2) at d=2 — the reason d is capped at 2 and this operator
  * targets SHORT strings: names, titles, tokens, URLs — never document
  * bodies), candidates meet on ONE key-hash exchange (with a small
  * reference side, AQE broadcasts the exploded keys and candidate
  * generation is map-side with NO shuffle of the big side), the verify
  * filter runs before the pair-dedup exchange so only true matches pay
  * it. Candidate volume per key is |L_k|·|R_k| — value-duplicate-heavy
  * inputs should be deduped to distinct strings first (join back by
  * string afterwards), exactly as [[Dedup]] treats its hot buckets.
  * NULL strings never match (their neighborhoods are NULL, and explode
  * drops them).
  *
  * Output: `left.columns ++ right.columns ++ dist` (column sets must be
  * disjoint), one row per matching pair.
  */
object FuzzyJoin {

  /** All strings reachable by deleting up to `d` characters (includes the
    * string itself): `sequence(0, length)` folds the identity case (i=0)
    * and each 1-based deletion position into one transform, which also
    * keeps the empty string safe (sequence(0,0) = [0] — Spark's
    * sequence(1,0) would DESCEND, not return empty).
    */
  private[operators] def deletionKeys(c: String, d: Int): Column = {
    require(d == 1 || d == 2, s"maxDist must be 1 or 2, got $d")
    def del(s: String) =
      s"transform(sequence(0, length($s)), i -> " +
        s"if(i = 0, $s, concat(substring($s, 1, i-1), substring($s, i+1))))"
    val d1 = del(c)
    if (d == 1) expr(s"array_distinct($d1)")
    else expr(s"array_distinct(flatten(transform($d1, t -> ${del("t")})))")
  }

  def fuzzyJoin(
      left: DataFrame,
      right: DataFrame,
      leftCol: String,
      rightCol: String,
      maxDist: Int): DataFrame = {
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty, s"column sets must be disjoint, both have $overlap")
    val l = left.withColumn("_fk", explode(deletionKeys(leftCol, maxDist)))
    val r = right.withColumn("_fk", explode(deletionKeys(rightCol, maxDist)))
    l.join(r, "_fk")
      .withColumn("dist", levenshtein(col(leftCol), col(rightCol), maxDist))
      .filter(col("dist") =!= -1)
      .drop("_fk")
      .distinct()
  }
}
