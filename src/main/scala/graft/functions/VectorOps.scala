package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd vector folds for the embedding tier.
  *
  * The interpreted formulation (`aggregate` over `zip_with`) evaluates a
  * boxed lambda per element — measured ~hundreds of core-microseconds per
  * 64-dim dot product, which dominates candidate verification on any
  * dup-heavy corpus (2.7M candidates ≈ half the 10×-corpus near-dup
  * runtime). These expressions emit a tight primitive Java loop inside
  * whole-stage codegen instead.
  *
  * Arithmetic is BIT-IDENTICAL to the interpreted twins (same
  * float→double widening, same left-to-right accumulation order), so the
  * DuckDB oracles and every previously-verified result are unaffected —
  * asserted element-for-element in `VectorOpsSpec`.
  *
  * Null semantics mirror `aggregate`+`zip_with`: any null element, null
  * array, or length mismatch (zip_with null-pads the shorter side) folds
  * to NULL.
  */
abstract class VectorFold extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two float/double array arguments, got " +
        s"${left.dataType} and ${right.dataType}")

  /** Per-element contribution, Scala (interpreted) flavor. */
  protected def combine(a: Double, b: Double): Double

  /** Per-element contribution, generated-Java flavor; `a`/`b` are
    * double-typed source snippets. Must stay in lockstep with [[combine]].
    */
  protected def combineJava(a: String, b: String): String

  private def get(arr: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => arr.getFloat(i).toDouble
    case _ => arr.getDouble(i)
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[ArrayData]
    val y = r.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val (tl, tr) = (elemType(left).get, elemType(right).get)
    var acc = 0.0
    var i = 0
    while (i < x.numElements()) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += combine(get(x, tl, i), get(y, tr, i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      def getter(t: DataType, v: String, i: String) = t match {
        case FloatType => s"(double) $v.getFloat($i)"
        case _ => s"$v.getDouble($i)"
      }
      val (tl, tr) = (elemType(left).get, elemType(right).get)
      val i = ctx.freshName("vfI")
      val n = ctx.freshName("vfN")
      val acc = ctx.freshName("vfAcc")
      s"""
         |int $n = $l.numElements();
         |if ($n != $r.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($l.isNullAt($i) || $r.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${combineJava(getter(tl, l, i), getter(tr, r, i))};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })
}

/** Σ aᵢ·bᵢ — sequential left-to-right double accumulation. */
case class DotProduct(left: Expression, right: Expression) extends VectorFold {
  override protected def combine(a: Double, b: Double): Double = a * b
  override protected def combineJava(a: String, b: String): String =
    s"($a) * ($b)"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dot_product"
}

/** Σ (aᵢ−bᵢ)² — squared L2 distance, same accumulation order as the
  * interpreted `zip_with` diff-square.
  */
case class SqL2Dist(left: Expression, right: Expression) extends VectorFold {
  override protected def combine(a: Double, b: Double): Double = {
    val d = a - b; d * d
  }
  override protected def combineJava(a: String, b: String): String =
    s"(($a) - ($b)) * (($a) - ($b))"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqL2Dist =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sq_l2_dist"
}

object VectorOps {
  import org.apache.spark.sql.graftbridge.Bridge

  def dot_product(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  def sq_l2_dist(a: Column, b: Column): Column =
    Bridge.column(SqL2Dist(Bridge.expression(a), Bridge.expression(b)))
}
