package graft.transforms

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spark 4 `VariantType` face of the schemaless path — SURVEY.md §1.3
  * option (a). A JSON string column parses once into a binary variant;
  * downstream field access (`variant_get`) is then a cheap binary probe
  * instead of a re-parse per extraction, which matters when many
  * extractions hit the same schemaless payload at scale.
  *
  * Variant is read-oriented: there is no public variant *rebuild* surface
  * in Spark 4.1, so the mutating schemaless operators (drop/hoist) stay
  * on the Jackson path ([[JsonOps]]); Variant covers the
  * extract/filter/type-inspection side.
  */
object VariantOps {

  /** Parse a JSON string column to a variant column (fails on malformed
    * JSON; `try_parse_json` yields null instead).
    */
  def parseJson(c: Column, lenient: Boolean = false): Column =
    if (lenient) try_parse_json(c) else parse_json(c)

  /** Typed field extraction: `extract(v, "$.a.b", "bigint")`. */
  def extract(v: Column, path: String, targetType: String): Column =
    variant_get(v, path, targetType)

  def extractLenient(v: Column, path: String, targetType: String): Column =
    try_variant_get(v, path, targetType)

  /** Attach a parsed variant column alongside a JSON string column. */
  def withVariant(df: DataFrame, jsonCol: String, asCol: String,
                  lenient: Boolean = false): DataFrame =
    df.withColumn(asCol, parseJson(col(jsonCol), lenient))
}
