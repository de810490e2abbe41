package graft.transforms

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Schemaless path: the engine represents the reference's
  * schemaless `Map<String,Object>` world (`DropField.java:55-61`,
  * `ExtendedHoistField.java:75-99`) as JSON `StringType` columns
  * (decision in SURVEY.md §1.3 — Spark columns are statically typed, so
  * heterogeneous per-record maps ride as JSON text).
  *
  * v1 implementation is a Scala UDF over Jackson (jackson-databind ships
  * with Spark's own runtime jars). This is the one non-codegen island in
  * the engine; it is confined to explicitly-schemaless columns. The
  * schema-ful hot path ([[NestedOps]]) never goes through here.
  * TODO(perf): replace with a custom Catalyst Expression implementing
  * `doGenCode` over Jackson's streaming API if the schemaless path ever
  * becomes hot (SURVEY.md §7.3).
  */
object JsonOps extends Serializable {

  // One mapper per executor JVM; ObjectMapper is thread-safe after config.
  @transient private lazy val mapper = new ObjectMapper()

  private def dropRec(node: ObjectNode, paths: Seq[List[String]]): Unit = {
    val (here, deeper) = paths.partition(_.lengthCompare(1) == 0)
    here.foreach(p => node.remove(p.head))
    deeper.groupBy(_.head).foreach { case (name, ps) =>
      node.get(name) match {
        // Recursion descends only JSON objects — reference descends only
        // Maps (`DropField.java:74-78`); arrays/scalars are opaque leaves.
        case child: ObjectNode => dropRec(child, ps.map(_.tail))
        case _ => ()
      }
    }
  }

  /** Schemaless drop: `{"k1":123,"parent":{"child":{"k2":"x"}}}` with
    * fields=`parent.child.k2` → `{"k1":123,"parent":{"child":{}}}`
    * (reference `DropFieldTest.java:106-161`). Null in → null out
    * (`DropField.java:45-46`); non-object JSON throws, mirroring the
    * reference's `requireMap` (`DropField.java:56`).
    */
  def dropJsonUdf(fields: Seq[String]): UserDefinedFunction = {
    val paths = fields.map(NestedOps.parsePath)
    udf { (s: String) =>
      if (s == null) null
      else {
        val node = mapper.readTree(s)
        node match {
          case obj: ObjectNode =>
            dropRec(obj, paths)
            mapper.writeValueAsString(obj)
          case _ => throw new IllegalArgumentException(
            "Only Map (JSON object) values are supported by schemaless DropField, found: " + s)
        }
      }
    }
  }

  /** Schemaless hoist (reference `ExtendedHoistField.java:75-99`):
    *  - empty keep-list wraps anything, even bare primitives:
    *    `42` → `{"magic":42}` (test `ExtendedHoistFieldTest.java:41-50`);
    *  - non-empty keep-list requires a JSON object, else
    *    IllegalArgumentException (`ExtendedHoistField.java:51-60`);
    *  - the inner object is added only if non-empty
    *    (`ExtendedHoistField.java:94-96`) — unlike the schema-ful path,
    *    JSON can genuinely omit the key, so we reproduce omission exactly.
    */
  def hoistJsonUdf(field: String, keepInRoot: Seq[String]): UserDefinedFunction = {
    val keep = keepInRoot.toSet
    udf { (s: String) =>
      if (s == null) null
      else {
        val node = mapper.readTree(s)
        if (keep.isEmpty) {
          val out = mapper.createObjectNode()
          out.set[com.fasterxml.jackson.databind.JsonNode](field, node)
          mapper.writeValueAsString(out)
        } else node match {
          case obj: ObjectNode =>
            val root = mapper.createObjectNode()
            val inner = mapper.createObjectNode()
            obj.fields().forEachRemaining { e =>
              if (keep.contains(e.getKey)) root.set[com.fasterxml.jackson.databind.JsonNode](e.getKey, e.getValue)
              else inner.set[com.fasterxml.jackson.databind.JsonNode](e.getKey, e.getValue)
            }
            if (inner.size() > 0) root.set[com.fasterxml.jackson.databind.JsonNode](field, inner)
            mapper.writeValueAsString(root)
          case _ => throw new IllegalArgumentException(
            "Only Map (JSON object) values are supported if keepInRootFieldNames is configured, found: " + s)
        }
      }
    }
  }

  def dropJson(c: Column, fields: Seq[String]): Column = dropJsonUdf(fields)(c)
  def hoistJson(c: Column, field: String, keepInRoot: Seq[String]): Column =
    hoistJsonUdf(field, keepInRoot)(c)
}
