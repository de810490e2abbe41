package graft.config

import org.apache.spark.sql.types._

import graft.SparkTestBase

/** Config parsing + chain composition — the reference's `configure(Map)` /
  * ConfigDef validation (`DropField.java:27-36`,
  * `ExtendedHoistField.java:41-68`) and `transforms=a,b,c` chain
  * (`README.md:12-16`).
  */
class ConnectPropsSpec extends SparkTestBase {

  test("worker-style chain: drop then hoist, applied in declared order") {
    val fn = ConnectProps.compile(Map(
      "transforms" -> "dropK,hoist",
      "transforms.dropK.type" -> "DropField$Value",
      "transforms.dropK.fields" -> "parent.child.k2",
      "transforms.hoist.type" -> "org.apache.kafka.connect.transforms.ExtendedHoistField$Value",
      "transforms.hoist.field" -> "magic",
      "transforms.hoist.keepInRootFieldNames" -> "k1"))
    val valueType = StructType(Seq(
      StructField("k1", IntegerType),
      StructField("parent", StructType(Seq(
        StructField("child", StructType(Seq(StructField("k2", StringType)))))))))
    val in = envelopeDf(StringType, valueType,
      "k", org.apache.spark.sql.Row(123, org.apache.spark.sql.Row(org.apache.spark.sql.Row("x"))))
    val out = fn(in)
    val vt = out.schema("value").dataType.asInstanceOf[StructType]
    assert(vt.fieldNames.toSeq == Seq("k1", "magic"))
    val inner = vt("magic").dataType.asInstanceOf[StructType]
    assert(inner.fieldNames.toSeq == Seq("parent"))
    val row = out.select("value").head().getStruct(0)
    assert(row.getInt(0) == 123)
    // parent survived the drop of its leaf, hoisted under magic, child empty
    assert(row.getStruct(1).getStruct(0).getStruct(0).length == 0)
  }

  test("missing required 'field' on hoist throws, ConfigDef-style (ExtendedHoistField.java:42-43)") {
    val ex = intercept[IllegalArgumentException] {
      ConnectProps.parseOne(Map("type" -> "ExtendedHoistField$Key"))
    }
    assert(ex.getMessage.contains("\"field\""))
  }

  test("unknown transform type throws") {
    val ex = intercept[IllegalArgumentException] {
      ConnectProps.parseOne(Map("type" -> "NoSuchTransform$Value"))
    }
    assert(ex.getMessage.contains("NoSuchTransform"))
  }

  test("schemaless=false forbids the JSON interpretation of a string column") {
    import graft.transforms.DropField
    val t = ConnectProps.parseOne(Map(
      "type" -> "DropField$Value", "fields" -> "k", "schemaless" -> "false"))
      .asInstanceOf[DropField]
    val in = envelopeDf(StringType, StringType, "k", """{"k":1}""")
    val ex = intercept[IllegalArgumentException] { t(in) }
    assert(ex.getMessage.contains("string") || ex.getMessage.contains("Struct"))
    // explicit true keeps the JSON path
    val t2 = ConnectProps.parseOne(Map(
      "type" -> "DropField$Value", "fields" -> "k", "schemaless" -> "true"))
      .asInstanceOf[DropField]
    assert(t2(in).select("value").head().getString(0) == "{}")
  }

  test("bare type name targets value; $Key suffix targets key; column override wins") {
    import graft.transforms.DropField
    assert(ConnectProps.parseOne(Map("type" -> "DropField"))
      .asInstanceOf[DropField].targetCol == "value")
    assert(ConnectProps.parseOne(Map("type" -> "DropField$Key"))
      .asInstanceOf[DropField].targetCol == "key")
    assert(ConnectProps.parseOne(Map("type" -> "DropField$Key", "column" -> "props"))
      .asInstanceOf[DropField].targetCol == "props")
  }
}
