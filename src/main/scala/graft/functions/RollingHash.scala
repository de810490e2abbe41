package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit polynomial rolling hash of a string's UTF-8 bytes
  * (`h = 31·h + b`, wrapping) — the engine-side document fingerprint.
  *
  * This is the "custom Catalyst Expression" extension tier (SURVEY.md
  * §7.3): a native `Expression` with `doGenCode`, so it participates in
  * whole-stage codegen — no UDF boxing, no interpreted fallback. The
  * md5-based [[graft.operators.TextAnalysis.fingerprint]] stays the
  * portable/oracle-checkable flavor; this one is the cheap hot-path
  * flavor (one multiply-add per byte, no digest allocation).
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires a string argument, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    RollingHash.hashBytes(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("rhBytes")
      val i = ctx.freshName("rhI")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long ${ev.value}_acc = ${RollingHash.Seed}L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  ${ev.value}_acc = 31L * ${ev.value}_acc + (long) $bytes[$i];
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  final val Seed = 1125899906842597L

  /** Interpreted twin of the generated loop (must stay in lockstep). */
  def hashBytes(bytes: Array[Byte]): Long = {
    var h = Seed
    var i = 0
    while (i < bytes.length) { h = 31L * h + bytes(i); i += 1 }
    h
  }

  /** Column API: `rolling_hash($"text")`. */
  def rolling_hash(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(RollingHash(Bridge.expression(c)))
  }

  /** SQL registration: `SELECT rolling_hash(text) FROM ...`. */
  def register(spark: SparkSession): Unit =
    org.apache.spark.sql.graftbridge.Bridge.registerFunction(
      spark, "rolling_hash", exprs => RollingHash(exprs.head))
}
