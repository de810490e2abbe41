package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of two integer dimensions — the space-filling
  * curve behind multi-dimensional data clustering in modern lakehouse
  * layouts, and the strictly-better-locality sibling of
  * [[ZOrder Morton/Z-order]]: the Hilbert curve takes UNIT steps only
  * (consecutive indices are always grid neighbours — property-tested),
  * where the Z-curve jumps across the grid at every power-of-two
  * boundary. The payoff shows exactly where file boundaries are NOT
  * aligned to power-of-two tiles (real writers split by target file
  * size, not by tile): any contiguous Hilbert index range stays a
  * compact blob, so each parquet file's (min,max) envelope in BOTH
  * dimensions stays tight and box predicates prune more files. With
  * power-of-two-aligned splits the two curves tie; Hilbert never loses.
  *
  * The index is the classic quadrant-rotation recurrence (top bit down,
  * rotate/flip each sub-quadrant so curve ends always meet — the
  * standard `xy2d` formulation of Hilbert's 1891 curve): per bit-level
  * `s`, the quadrant `(3·rx)^ry` contributes `s²` cells, then the
  * coordinate frame rotates. A `when`-chain Column formulation would
  * triple the expression tree per level (the rotation reads each
  * coordinate twice), so this is the custom-codegen-`Expression` tier
  * (SURVEY §7.3): `doGenCode` emits the loop itself — a dozen long ops
  * per level inside whole-stage codegen, no UDF boxing, no tree
  * blow-up. Inputs are masked to the low `bits` bits (callers bucket
  * first if the domain is wider), mirroring [[ZOrder.zValue]].
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_index requires two BIGINT arguments, got " +
        s"(${left.dataType}, ${right.dataType})")

  override def nullSafeEval(x: Any, y: Any): Any =
    Hilbert.xy2d(bits, x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = 1L << bits
      val x = ctx.freshName("hX")
      val y = ctx.freshName("hY")
      val s = ctx.freshName("hS")
      val rx = ctx.freshName("hRx")
      val ry = ctx.freshName("hRy")
      val t = ctx.freshName("hT")
      val d = ctx.freshName("hD")
      // lockstep twin of Hilbert.xy2d — change both together
      s"""
         |long $x = $a & ${n - 1}L;
         |long $y = $b & ${n - 1}L;
         |long $d = 0L;
         |for (long $s = ${n / 2}L; $s > 0L; $s /= 2L) {
         |  long $rx = (($x & $s) > 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) {
         |      $x = ${n - 1}L - $x;
         |      $y = ${n - 1}L - $y;
         |    }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "hilbert_index"
}

object Hilbert {

  /** Interpreted twin of the generated loop (must stay in lockstep).
    * Bijective on the 2^bits × 2^bits grid with unit-step adjacency
    * between consecutive indices — both property-tested.
    */
  def xy2d(bits: Int, xIn: Long, yIn: Long): Long = {
    val n = 1L << bits
    var x = xIn & (n - 1)
    var y = yIn & (n - 1)
    var d = 0L
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  /** Column API: `hilbert_index($"x", $"y", 10)`. */
  def hilbert_index(x: Column, y: Column, bits: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(HilbertIndex(
      Bridge.expression(x.cast("long")), Bridge.expression(y.cast("long")), bits))
  }

  /** The DuckDB/ANSI oracle mirror: the same loop UNROLLED as a chain of
    * `bits` CTEs (`<p>1` … `<p>{bits}`), each one bit-level of the
    * rotation recurrence. The caller appends `FROM <p>{bits}` and reads
    * `<p>d{bits}` as the index. `src` must expose the two dimension
    * expressions; state columns are prefixed with `<p>` to stay clear of
    * source columns.
    */
  def indexSqlCtes(src: String, xExpr: String, yExpr: String, bits: Int,
                   p: String = "h"): String = {
    val n = 1L << bits
    val base = s"${p}0 AS (SELECT *, CAST(($xExpr) AS BIGINT) & ${n - 1} AS ${p}x0, " +
      s"CAST(($yExpr) AS BIGINT) & ${n - 1} AS ${p}y0, " +
      s"CAST(0 AS BIGINT) AS ${p}d0 FROM $src)"
    val steps = (0 until bits).map { k =>
      val s = 1L << (bits - 1 - k)
      val (x, y, d) = (s"${p}x$k", s"${p}y$k", s"${p}d$k")
      s"${p}${k + 1} AS (SELECT *, " +
        s"CASE WHEN ($y & $s) = 0 THEN (CASE WHEN ($x & $s) > 0 " +
        s"THEN ${n - 1} - $y ELSE $y END) ELSE $x END AS ${p}x${k + 1}, " +
        s"CASE WHEN ($y & $s) = 0 THEN (CASE WHEN ($x & $s) > 0 " +
        s"THEN ${n - 1} - $x ELSE $x END) ELSE $y END AS ${p}y${k + 1}, " +
        s"$d + $s * $s * xor(CASE WHEN ($x & $s) > 0 THEN 3 ELSE 0 END, " +
        s"CASE WHEN ($y & $s) > 0 THEN 1 ELSE 0 END) AS ${p}d${k + 1} " +
        s"FROM ${p}$k)"
    }
    (base +: steps).mkString(",\n")
  }

  /** SQL registration: `SELECT hilbert_index(x, y, 10) FROM ...`. */
  def register(spark: SparkSession): Unit =
    org.apache.spark.sql.graftbridge.Bridge.registerFunction(
      spark, "hilbert_index", exprs => HilbertIndex(
        org.apache.spark.sql.catalyst.expressions.Cast(exprs(0), LongType),
        org.apache.spark.sql.catalyst.expressions.Cast(exprs(1), LongType),
        exprs(2).eval().asInstanceOf[Number].intValue()))
}
