package graft.config

import org.apache.spark.sql.DataFrame

import graft.model.Envelope
import graft.transforms.{DropField, ExtendedHoistField, StructuredToJsonString, Transform}

/** Connect-style property-map front end — the engine's equivalent of the
  * reference's `configure(Map<String,?>)` + `ConfigDef` validation
  * (`DropField.java:27-36`, `ExtendedHoistField.java:41-68`) and the
  * worker's `transforms=a,b,c` chain declaration (`README.md:12-16`).
  *
  * Example:
  * {{{
  * transforms = dropK,hoist
  * transforms.dropK.type   = DropField$Value
  * transforms.dropK.fields = parent.child.k2
  * transforms.hoist.type   = ExtendedHoistField$Key
  * transforms.hoist.field  = magic
  * transforms.hoist.keepInRootFieldNames = keepInRoot,keepInRoot2
  * }}}
  *
  * Validation mirrors ConfigDef semantics: unknown transform type and
  * missing required `field` raise IllegalArgumentException at parse time
  * (plan-time, on the driver — SURVEY.md §3.1). Class names accept the
  * bare reference form (`DropField$Value`) and any package-qualified
  * variant; the `$Key`/`$Value` suffix selects the envelope column.
  */
object ConnectProps {

  /** Parse one transform's props (already stripped of its alias prefix). */
  def parseOne(props: Map[String, String]): Transform = {
    val tpe = props.getOrElse("type", throw new IllegalArgumentException(
      "Missing required configuration \"type\" which has no default value."))
    val simple = tpe.split('.').last // strip any package qualifier
    val (base, target) = simple.split('$') match {
      case Array(b) => (b, Envelope.ValueCol)
      case Array(b, "Key") => (b, Envelope.KeyCol)
      case Array(b, "Value") => (b, Envelope.ValueCol)
      case _ => throw new IllegalArgumentException(s"Unrecognized transform type: $tpe")
    }
    // Explicit column override (engine extension — lets transforms run on
    // arbitrary DataFrame columns, not just the Kafka envelope).
    val col = props.getOrElse("column", target)
    val schemaless = props.get("schemaless").map(_.trim.toBoolean)
    base match {
      case "DropField" =>
        DropField(col, parseList(props.getOrElse("fields", "")), schemaless)
      case "ExtendedHoistField" =>
        val field = props.getOrElse("field", throw new IllegalArgumentException(
          "Missing required configuration \"field\" which has no default value."))
        ExtendedHoistField(col, field,
          parseList(props.getOrElse("keepInRootFieldNames", "")), schemaless)
      case "StructuredSchemalessToJsonString" | "StructuredToJsonString" =>
        StructuredToJsonString(col,
          props.get("includeStructs").exists(_.trim.toBoolean))
      case other =>
        throw new IllegalArgumentException(s"Unknown transform type: $other")
    }
  }

  /** Parse a full worker-style config: `transforms=a,b` + per-alias keys. */
  def parseChain(props: Map[String, String]): Seq[Transform] = {
    val aliases = parseList(props.getOrElse("transforms", ""))
    aliases.map { alias =>
      val prefix = s"transforms.$alias."
      val scoped = props.collect {
        case (k, v) if k.startsWith(prefix) => k.stripPrefix(prefix) -> v
      }
      if (scoped.isEmpty) throw new IllegalArgumentException(
        s"Transform alias '$alias' declared in 'transforms' but has no configuration.")
      parseOne(scoped)
    }
  }

  /** Parse + compose: the whole reference "query plan" as one function. */
  def compile(props: Map[String, String]): DataFrame => DataFrame =
    Transform.chain(parseChain(props))

  private def parseList(s: String): Seq[String] =
    s.split(',').map(_.trim).filter(_.nonEmpty).toSeq
}
