package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC (canonical composition) of a string column — the first
  * step of crawl-text cleanup: the same user-visible text arrives from
  * the web in both composed (`é` = U+00E9) and decomposed
  * (`e` + U+0301) forms, and every downstream exact/near-dup hash,
  * shingle, and token count treats those byte sequences as different
  * documents unless normalization happens first.
  *
  * Same extension tier as [[RollingHash]]: a native `Expression` with
  * `doGenCode`, so it rides whole-stage codegen (the generated code
  * calls the static helper below — no UDF boxing, no interpreted
  * fallback). NFC is implemented by `java.text.Normalizer` (UAX #15);
  * DuckDB's `nfc_normalize` (utf8proc) implements the same standard, so
  * results are oracle-checkable cross-engine. The already-normalized
  * fast path matters at scale: real corpora are overwhelmingly NFC
  * already, and `Normalizer.isNormalized` is a scan with no allocation,
  * so the common case returns the input `UTF8String` untouched.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string argument, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    NfcNormalize.normalizeUtf8(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.normalizeUtf8($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {
  import java.text.Normalizer

  /** Shared by interpreted eval and generated code (must stay in
    * lockstep). Two fast paths on the dominant already-NFC case: pure
    * ASCII (always NFC by definition) returns the input after a byte
    * scan with NO String materialization at all — real corpora are
    * overwhelmingly ASCII — and non-ASCII-but-normalized input returns
    * the original `UTF8String` after the `isNormalized` check.
    */
  def normalizeUtf8(s: UTF8String): UTF8String = {
    if (s.isFullAscii) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Column API: `nfc_normalize($"text")`. */
  def nfc_normalize(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(NfcNormalize(Bridge.expression(c)))
  }

  /** SQL registration for sessions built without extensions. */
  def register(spark: SparkSession): Unit =
    org.apache.spark.sql.graftbridge.Bridge.registerFunction(
      spark, "nfc_normalize", exprs => NfcNormalize(exprs.head))
}
