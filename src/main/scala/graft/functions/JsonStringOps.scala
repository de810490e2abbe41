package graft.functions

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native-Expression flavor of the schemaless JSON rewrites: same
  * semantics as [[graft.transforms.JsonOps]], but as Catalyst
  * `UnaryExpression`s with `doGenCode`, so the surrounding projection
  * stays inside whole-stage codegen (a `ScalaUDF` forces an interpreted
  * eval boundary plus per-row encoder conversions; these call one static
  * method on UTF8String and return UTF8String — no boxing, no encoders).
  *
  * The JSON work itself is still Jackson (a streaming-parser rewrite is
  * not worth the complexity until a profile says so); what the Expression
  * form removes is the UDF *plumbing* cost and the codegen fence.
  */
object JsonStringOps {

  private lazy val mapper = new ObjectMapper()

  private def dropRec(node: ObjectNode, paths: Seq[List[String]]): Unit = {
    val (here, deeper) = paths.partition(_.lengthCompare(1) == 0)
    here.foreach(p => node.remove(p.head))
    deeper.groupBy(_.head).foreach { case (name, ps) =>
      node.get(name) match {
        case child: ObjectNode => dropRec(child, ps.map(_.tail))
        case _ => ()
      }
    }
  }

  /** Static entry point for hoist (see `ExtendedHoistField.java:75-99`):
    * empty keep-list wraps any JSON value; non-empty requires an object;
    * empty inner object is genuinely omitted.
    */
  def hoistJson(s: UTF8String, field: String, keep: Array[String]): UTF8String =
    if (s == null) null
    else UTF8String.fromString(hoistJsonString(s.toString, field, keep))

  /** String flavor — single source of truth shared with the UDF wrappers
    * in [[graft.transforms.JsonOps]].
    */
  def hoistJsonString(str: String, field: String, keep: Array[String]): String = {
    val node = mapper.readTree(str)
    if (keep.isEmpty) {
      val out = mapper.createObjectNode()
      out.set[com.fasterxml.jackson.databind.JsonNode](field, node)
      mapper.writeValueAsString(out)
    } else node match {
      case obj: ObjectNode =>
        val keepSet = keep.toSet
        val root = mapper.createObjectNode()
        val inner = mapper.createObjectNode()
        obj.fields().forEachRemaining { e =>
          if (keepSet.contains(e.getKey))
            root.set[com.fasterxml.jackson.databind.JsonNode](e.getKey, e.getValue)
          else inner.set[com.fasterxml.jackson.databind.JsonNode](e.getKey, e.getValue)
        }
        if (inner.size() > 0)
          root.set[com.fasterxml.jackson.databind.JsonNode](field, inner)
        mapper.writeValueAsString(root)
      case _ => throw new IllegalArgumentException(
        "Only Map (JSON object) values are supported if keepInRootFieldNames is configured, found: " + str)
    }
  }

  /** Static entry point used by both eval and generated code. */
  def dropJson(s: UTF8String, paths: Array[Array[String]]): UTF8String =
    if (s == null) null
    else UTF8String.fromString(dropJsonString(s.toString, paths))

  /** String flavor — single source of truth shared with the UDF wrappers
    * in [[graft.transforms.JsonOps]].
    */
  def dropJsonString(str: String, paths: Array[Array[String]]): String = {
    val node = mapper.readTree(str)
    node match {
      case obj: ObjectNode =>
        dropRec(obj, paths.toSeq.map(_.toList))
        mapper.writeValueAsString(obj)
      case _ => throw new IllegalArgumentException(
        "Only Map (JSON object) values are supported by schemaless DropField, found: " + str)
    }
  }
}

/** `json_drop_fields(json, paths)` — drop dotted paths from a JSON-object
  * string column. Paths are compile-time constants (plan-time state, like
  * the reference's configured `fields` list, `DropField.java:27-36`).
  */
case class JsonDropFields(child: Expression, fields: Seq[String])
  extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"json_drop_fields requires a string column, got ${child.dataType}")

  @transient private lazy val pathArr: Array[Array[String]] =
    fields.map(_.split('.')).toArray

  override def nullSafeEval(v: Any): Any =
    JsonStringOps.dropJson(v.asInstanceOf[UTF8String], pathArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pathsRef = ctx.addReferenceObj("jsonDropPaths", pathArr, "java.lang.String[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.JsonStringOps.dropJson($c, $pathsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): JsonDropFields =
    copy(child = newChild)
  override def prettyName: String = "json_drop_fields"
}

object JsonDropFields {
  def apply(c: Column, fields: Seq[String]): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(new JsonDropFields(Bridge.expression(c), fields))
  }
}

/** `json_hoist_field(json)` — schemaless hoist with keep-in-root, native
  * Expression flavor of [[graft.transforms.JsonOps.hoistJsonUdf]].
  */
case class JsonHoistField(child: Expression, field: String, keepInRoot: Seq[String])
  extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"json_hoist_field requires a string column, got ${child.dataType}")

  @transient private lazy val keepArr: Array[String] = keepInRoot.toArray

  override def nullSafeEval(v: Any): Any =
    JsonStringOps.hoistJson(v.asInstanceOf[UTF8String], field, keepArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keepRef = ctx.addReferenceObj("jsonHoistKeep", keepArr, "java.lang.String[]")
    val fieldRef = ctx.addReferenceObj("jsonHoistField", field, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.JsonStringOps.hoistJson($c, $fieldRef, $keepRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): JsonHoistField =
    copy(child = newChild)
  override def prettyName: String = "json_hoist_field"
}

object JsonHoistField {
  def apply(c: Column, field: String, keepInRoot: Seq[String]): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(new JsonHoistField(Bridge.expression(c), field, keepInRoot))
  }
}
