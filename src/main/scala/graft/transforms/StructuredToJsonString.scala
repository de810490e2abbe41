package graft.transforms

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, to_json}
import org.apache.spark.sql.types.{MapType, StructType}

import graft.model.Envelope

/** Serializes a structured *schemaless* value to a JSON string — the
  * engine counterpart of `StructuredSchemalessToJsonString`
  * (`StructuredSchemalessToJsonString.java:29-113`).
  *
  * The reference applies Jackson only when the record is schemaless AND the
  * datum is a `Map` (`:49-58`); schema-ful records and schemaless non-Map
  * data pass through untouched (`:61`, tests `:24-33,47-59`). In this
  * engine the reference's schemaless map is a `MapType` column, so the
  * per-record `instanceof` guard becomes a plan-time type check:
  *
  *  - `MapType` column → `to_json` (Spark's codegen'd `StructsToJson` —
  *    no Jackson, no UDF);
  *  - everything else (structs = schema-ful, primitives, strings) →
  *    identity.
  *
  * `includeStructs = true` additionally serializes struct columns — an
  * engine extension beyond parity (useful when feeding a Kafka sink that
  * wants a text payload), off by default to preserve the reference's
  * schema-ful passthrough semantics.
  */
case class StructuredToJsonString(
    targetCol: String,
    includeStructs: Boolean = false)
  extends Transform {

  override def apply(df: DataFrame): DataFrame =
    df.schema(targetCol).dataType match {
      case _: MapType => df.withColumn(targetCol, to_json(col(targetCol)))
      case _: StructType if includeStructs =>
        df.withColumn(targetCol, to_json(col(targetCol)))
      case _ => df
    }
}

object StructuredToJsonString {
  def key: StructuredToJsonString = StructuredToJsonString(Envelope.KeyCol)
  def value: StructuredToJsonString = StructuredToJsonString(Envelope.ValueCol)
}
