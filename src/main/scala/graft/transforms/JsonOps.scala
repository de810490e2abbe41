package graft.transforms

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

import graft.functions.JsonStringOps

/** Schemaless path, ScalaUDF flavor: the engine represents the
  * reference's schemaless `Map<String,Object>` world (`DropField
  * .java:55-61`, `ExtendedHoistField.java:75-99`) as JSON `StringType`
  * columns (SURVEY.md §1.3 — Spark columns are statically typed, so
  * heterogeneous per-record maps ride as JSON text).
  *
  * The Jackson rewrite logic lives ONCE in
  * [[graft.functions.JsonStringOps]]; these UDFs are thin wrappers kept
  * for comparison/testing. The production transforms use the native
  * Catalyst expressions ([[graft.functions.JsonDropFields]] /
  * [[graft.functions.JsonHoistField]]), which avoid the ScalaUDF eval
  * boundary and encoder conversions.
  */
object JsonOps extends Serializable {

  /** Schemaless drop: `{"k1":123,"parent":{"child":{"k2":"x"}}}` with
    * fields=`parent.child.k2` → `{"k1":123,"parent":{"child":{}}}`
    * (reference `DropFieldTest.java:106-161`). Null in → null out
    * (`DropField.java:45-46`); non-object JSON throws, mirroring the
    * reference's `requireMap` (`DropField.java:56`).
    */
  def dropJsonUdf(fields: Seq[String]): UserDefinedFunction = {
    val paths = fields.map(_.split('.')).toArray
    udf { (s: String) =>
      if (s == null) null else JsonStringOps.dropJsonString(s, paths)
    }
  }

  /** Schemaless hoist (reference `ExtendedHoistField.java:75-99`):
    * empty keep-list wraps anything (even bare primitives); non-empty
    * keep-list requires a JSON object; empty inner object omitted.
    */
  def hoistJsonUdf(field: String, keepInRoot: Seq[String]): UserDefinedFunction = {
    val keep = keepInRoot.toArray
    udf { (s: String) =>
      if (s == null) null else JsonStringOps.hoistJsonString(s, field, keep)
    }
  }

  def dropJson(c: Column, fields: Seq[String]): Column = dropJsonUdf(fields)(c)
  def hoistJson(c: Column, field: String, keepInRoot: Seq[String]): Column =
    hoistJsonUdf(field, keepInRoot)(c)
}
