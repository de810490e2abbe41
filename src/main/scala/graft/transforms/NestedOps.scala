package graft.transforms

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Plan-time nested-struct rewriting used by the schema-ful transform paths.
  *
  * All functions here produce pure `Column` expression trees
  * (`CreateNamedStruct` / `GetStructField` / `CaseWhen`) that Catalyst
  * resolves once at analysis time and Tungsten runs under whole-stage
  * codegen — the Spark-native replacement for the reference's per-record
  * `deepSchemaCopy`/`deepValueCopyWithSchema` recursion
  * (`DropField.java:94-119`), whose derived schema the reference had to
  * memoize in an LRU cache; here schema derivation happens exactly once.
  *
  * Path semantics follow the reference exactly (`DropField.java:63-75`):
  * dotted KIP-821 notation, naive split on `.` with no escaping, exact
  * full-path match drops the whole subtree, recursion descends only
  * struct fields (never arrays or map values), and a path that matches
  * nothing is a no-op.
  */
object NestedOps {

  /** `"parent.child.k2"` → `List("parent", "child", "k2")`. Reference:
    * naive string concatenation/splitting, `DropField.java:72,109`.
    */
  def parsePath(path: String): List[String] = path.split('.').toList

  /** Output schema of [[dropFieldsCol]]: `st` minus the exact-match paths.
    * Dropping every field of a struct legally yields an empty struct —
    * the reference's `DropFieldTest.java:56-64` behavior.
    */
  def dropSchema(st: StructType, paths: Seq[List[String]]): StructType = StructType(
    st.fields.toSeq.flatMap { f =>
      val hits = paths.filter(_.head == f.name)
      if (hits.exists(_.lengthCompare(1) == 0)) None
      else {
        val deeper = hits.collect { case h if h.lengthCompare(1) > 0 => h.tail }
        f.dataType match {
          case child: StructType if deeper.nonEmpty =>
            Some(f.copy(dataType = dropSchema(child, deeper)))
          case _ => Some(f)
        }
      }
    })

  /** Rebuild struct column `col` (of static type `st`) without the given
    * dotted paths. Null structs propagate as null (the reference NPEs
    * here — undefined behavior we define sanely, SURVEY.md §2.3 item 3).
    */
  def dropFieldsCol(col: Column, st: StructType, paths: Seq[List[String]]): Column = {
    val outType = dropSchema(st, paths)
    val kids: Seq[Column] = st.fields.toSeq.flatMap { f =>
      val hits = paths.filter(_.head == f.name)
      if (hits.exists(_.lengthCompare(1) == 0)) None
      else {
        val deeper = hits.collect { case h if h.lengthCompare(1) > 0 => h.tail }
        f.dataType match {
          case child: StructType if deeper.nonEmpty =>
            Some(dropFieldsCol(col.getField(f.name), child, deeper).as(f.name))
          case _ => Some(col.getField(f.name).as(f.name))
        }
      }
    }
    val rebuilt = struct(kids: _*)
    when(col.isNull, lit(null).cast(outType)).otherwise(rebuilt)
  }

  /** Hoist: keep `keepInRoot` fields of struct `col` at the root, move the
    * rest under a single child struct named `field` (appended last, as the
    * reference appends the inner field after root fields,
    * `ExtendedHoistField.java:118-123`).
    *
    * Data-dependent part: the reference omits the inner *value* entirely
    * when every movable field is null (`ExtendedHoistField.java:132-148`).
    * Spark schemas are static, so "absent" becomes "null": the inner
    * struct is null iff all moved fields are null (documented divergence,
    * SURVEY.md §7.5.2).
    *
    * Plan-time part: if nothing moves (all fields kept), the transform is
    * the identity and the caller should not rewrite the column at all —
    * mirroring the reference's cached-schema passthrough
    * (`ExtendedHoistField.java:149-151`). [[hoistMovedFields]] exposes the
    * partition so callers can make that decision statically.
    */
  def hoistCol(col: Column, st: StructType, field: String, keepInRoot: Seq[String]): Column = {
    val keep = keepInRoot.toSet
    val (rootFields, movedFields) = st.fields.toSeq.partition(f => keep.contains(f.name))
    require(movedFields.nonEmpty,
      s"hoistCol called with nothing to move; caller should passthrough (field=$field)")
    val innerType = StructType(movedFields)
    val inner = struct(movedFields.map(f => col.getField(f.name).as(f.name)): _*)
    val anyMovedNonNull = movedFields
      .map(f => col.getField(f.name).isNotNull)
      .reduce(_ || _)
    val innerOrNull = when(anyMovedNonNull, inner).otherwise(lit(null).cast(innerType))
    val rootCols = rootFields.map(f => col.getField(f.name).as(f.name))
    val rebuilt = struct(rootCols :+ innerOrNull.as(field): _*)
    val outType = StructType(rootFields :+ StructField(field, innerType, nullable = true))
    when(col.isNull, lit(null).cast(outType)).otherwise(rebuilt)
  }

  /** Which fields of `st` would move under the hoist. Empty ⇒ identity. */
  def hoistMovedFields(st: StructType, keepInRoot: Seq[String]): Seq[StructField] = {
    val keep = keepInRoot.toSet
    st.fields.toSeq.filterNot(f => keep.contains(f.name))
  }
}
