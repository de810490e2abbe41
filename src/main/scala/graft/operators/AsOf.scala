package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the LATEST right
  * row with the same key and `rightTs <= leftTs` — the lookup every
  * feature/training pipeline needs ("state of X as of this event") that
  * Spark has no built-in operator for.
  *
  * Formulation: union the two tagged sides and take a running
  * `last(right_payload, ignoreNulls)` over (key, ts, side) — ONE shuffle
  * on the key, no per-key loops, no range-explode. A join-then-filter
  * (`l.ts >= r.ts` + window max) would shuffle the cross product of every
  * key's rows; this shuffles each input row exactly once, which is the
  * difference between feasible and not at 100 TB. Right rows sort before
  * left rows at equal timestamps, so an exactly-simultaneous right row IS
  * matched (standard `>=` as-of semantics, same as DuckDB/kdb).
  *
  * Caveats: rows with NULL in a key column group together in the window
  * (unlike SQL equi-join semantics, where NULL never matches) — filter
  * null keys first if that matters. Matched payload arrives as one struct
  * column (`matchCol`), null when no right row precedes the left row.
  */
object AsOf {

  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTsCol: String, rightTsCol: String,
               rightValCols: Seq[String],
               matchCol: String = "asof"): DataFrame = {
    val leftStruct = struct(left.columns.map(col): _*)
    val rightStruct = struct(rightValCols.map(col): _*)
    val leftStructType = left.select(leftStruct).schema.head.dataType
    val rightStructType = right.select(rightStruct).schema.head.dataType
    val l = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTsCol).as("__ts"), lit(1).as("__side"),
        leftStruct.as("__l"), lit(null).cast(rightStructType).as("__r")): _*)
    val r = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTsCol).as("__ts"), lit(0).as("__side"),
        lit(null).cast(leftStructType).as("__l"), rightStruct.as("__r")): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.union(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*"), col("__match").as(matchCol))
  }
}
