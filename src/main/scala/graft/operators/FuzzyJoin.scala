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
  * Scale shape — the distinct-strings discipline is built in. Each side
  * is first projected to its DISTINCT join strings (one narrow exchange
  * carrying only the string column, never the payload), so candidate
  * volume per key is |distinct L_k|·|distinct R_k| regardless of how
  * value-duplicate-heavy the inputs are. Distinct strings expand to
  * their neighborhood keys (|s|+1 keys at d=1, O(|s|²/2) at d=2 — the
  * reason d is capped at 2 and this operator targets SHORT strings:
  * names, titles, tokens, URLs — never document bodies), candidates meet
  * on ONE key-hash join (with a small reference side, AQE broadcasts the
  * exploded keys and candidate generation is map-side with NO shuffle of
  * the big side), the verify filter runs before the pair-dedup exchange
  * so only true matches pay it, and the dedup exchange carries ONLY
  * (left string, right string, dist). Payload columns re-attach by
  * joining each side back on its own string — the matched-pair set is
  * bounded by true matches and broadcasts into the big side's scan.
  * Re-attachment also preserves input cardinality exactly: two identical
  * left rows matching one right row emit two output rows (a full-width
  * `distinct()` would silently collapse them).
  * NULL strings never match (dropped before the neighborhood explode).
  *
  * Output: `left.columns ++ right.columns ++ dist`, one row per matching
  * (left row, right row) pair. Column sets must be disjoint and neither
  * side may already contain a `dist` column.
  */
object FuzzyJoin {

  /** Backtick-quote an identifier for safe embedding in SQL text
    * (column names with dots, spaces, hyphens, or embedded backticks).
    */
  private def quoted(name: String): String =
    "`" + name.replace("`", "``") + "`"

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
    val d1 = del(quoted(c))
    if (d == 1) expr(s"array_distinct($d1)")
    else expr(s"array_distinct(flatten(transform($d1, t -> ${del("t")})))")
  }

  // internal columns; prefixed so user schemas can't collide by accident,
  // and rejected explicitly if they somehow do
  private val LS = "_graft_fj_l"
  private val RS = "_graft_fj_r"
  private val FK = "_graft_fj_k"

  /** The matched DISTINCT-STRING pairs only — (`leftOut`, `rightOut`,
    * `dist`), one row per distinct (left string, right string) pair
    * within `maxDist` edits. This is [[fuzzyJoin]] WITHOUT the payload
    * re-attach joins: when the caller's sides are already distinct
    * single-string tables (the entity-resolution candidate-generation
    * shape), re-attaching is an identity join per side — two join
    * stages that add nothing at any scale — so callers in that shape
    * use this face directly (r20).
    *
    * `dedup = false` skips the pair-dedup exchange and may emit the
    * same pair more than once (once per shared deletion key — bounded
    * by the neighborhood size): for callers whose next step is itself a
    * pair-keyed aggregate (EntityResolution.candidatePairs' groupBy),
    * the dedup here is a redundant full exchange of the pair ledger.
    */
  private[operators] def fuzzyStringPairs(
      left: DataFrame,
      right: DataFrame,
      leftCol: String,
      rightCol: String,
      maxDist: Int,
      leftOut: String,
      rightOut: String,
      dedup: Boolean = true): DataFrame = {
    val ls = left.select(left(leftCol).as(LS)).filter(col(LS).isNotNull).distinct()
    val rs = right.select(right(rightCol).as(RS)).filter(col(RS).isNotNull).distinct()
    val verified = ls.withColumn(FK, explode(deletionKeys(LS, maxDist)))
      .join(rs.withColumn(FK, explode(deletionKeys(RS, maxDist))), FK)
      .withColumn("dist", levenshtein(col(LS), col(RS), maxDist))
      .filter(col("dist") =!= -1)
      .drop(FK)
    // narrow: (left string, right string, dist) only
    (if (dedup) verified.distinct() else verified)
      .select(col(LS).as(leftOut), col(RS).as(rightOut), col("dist"))
  }

  def fuzzyJoin(
      left: DataFrame,
      right: DataFrame,
      leftCol: String,
      rightCol: String,
      maxDist: Int): DataFrame = {
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty, s"column sets must be disjoint, both have $overlap")
    val reserved = Set(LS, RS, FK, "dist")
    val clash = (left.columns ++ right.columns).toSet.intersect(reserved)
    require(clash.isEmpty, s"inputs must not contain reserved columns $clash")

    // distinct join strings only — the explode and the candidate join
    // never see payload columns or value-duplicate multiplicity
    val pairs = fuzzyStringPairs(left, right, leftCol, rightCol, maxDist, LS, RS)
    // join payloads back by string; dataset aliases break the self-join
    // lineage (pairs derives from both inputs)
    def q(alias: String, name: String) = col(alias + "." + quoted(name))
    left.as("_graft_fj_lt")
      .join(pairs.as("_graft_fj_p"), q("_graft_fj_lt", leftCol) === q("_graft_fj_p", LS))
      .join(right.as("_graft_fj_rt"), q("_graft_fj_p", RS) === q("_graft_fj_rt", rightCol))
      .select(left.columns.map(q("_graft_fj_lt", _))
        ++ right.columns.map(q("_graft_fj_rt", _)) :+ col("dist"): _*)
  }
}
