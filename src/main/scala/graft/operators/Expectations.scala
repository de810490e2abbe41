package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality gate — the constraint-validation /
  * quarantine-routing stage every ingest pipeline runs before letting a
  * batch near training data (the Deequ / expectations-suite class of
  * functionality, re-expressed Spark-first).
  *
  * Semantics: a [[Expectations.Check]] passes iff its predicate
  * evaluates TRUE — NULL counts as a VIOLATION (unlike SQL `CHECK`,
  * which waves NULL through; for pipeline hygiene an unevaluable
  * constraint is a dirty row, not a clean one). Each failing row is
  * routed to quarantine carrying a `violations` array naming every
  * failed check in declaration order — the triage key ("which rule, how
  * often" is then a plain `explode`+`groupBy` downstream).
  *
  * Scale shape: the gate is ONE narrow projection+filter pass — all
  * checks evaluate in a single codegen'd `array_compact(array(when…))`
  * expression, zero shuffles, zero extra scans (both outputs reuse one
  * tagged plan; under one action the scan itself is shared via AQE
  * stage reuse, and filters still push down past the tag column). A
  * check-per-job formulation (one `count` per rule, the naive port of
  * metric-library APIs) scans the corpus k times; this scans it once.
  */
object Expectations {

  /** A named row-level expectation: `pred` must evaluate TRUE. */
  final case class Check(name: String, pred: Column)

  /** Split `df` into (clean, quarantined). Clean rows pass every check
    * and keep the input schema exactly; quarantined rows carry
    * `violCol`: the names of their failed checks, in declaration order.
    */
  def gate(df: DataFrame, checks: Seq[Check],
           violCol: String = "violations"): (DataFrame, DataFrame) = {
    require(checks.nonEmpty, "at least one check required")
    val names = checks.map(_.name)
    require(names.distinct == names,
      s"check names must be unique, got duplicates in $names")
    require(!df.columns.contains(violCol),
      s"input already has a '$violCol' column — pass a different violCol")
    // NULL predicate -> violation: coalesce pins three-valued logic down
    val viol = array_compact(array(checks.map(c =>
      when(coalesce(c.pred, lit(false)), lit(null).cast("string"))
        .otherwise(lit(c.name))): _*))
    val tagged = df.withColumn(violCol, viol)
    (tagged.filter(size(col(violCol)) === 0).drop(violCol),
      tagged.filter(size(col(violCol)) > 0))
  }

  /** k-anonymity audit over quasi-identifier columns: every value
    * combination carried by FEWER than `k` rows — each output row is a
    * re-identification risk set (Sweeney's model: a quasi-identifier
    * that is nearly unique links a "de-identified" record back to a
    * person; the PII-redaction pass upstream removes direct
    * identifiers, this finds the indirect ones). Output = the quasi
    * columns + `group_size`, ready for suppression or coarser
    * generalization upstream.
    *
    * Scale shape: ONE map-side-combinable grouped count — the audit of
    * a 100 TB table moves one row per distinct combination per map
    * partition; the `< k` filter cuts the result to the risk sets
    * before anything leaves the aggregate. More data genuinely
    * anonymizes: a combination that is a violation at 1× can clear k
    * at 10× because every group is denser.
    */
  def kAnonymityViolations(df: DataFrame, quasiCols: Seq[String],
                           k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2 (k=$k checks nothing)")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_size"))
      .filter(col("group_size") < k)
  }
}
