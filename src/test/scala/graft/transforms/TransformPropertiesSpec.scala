package graft.transforms

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkTestBase
import graft.functions.RollingHash

/** Property-based coverage (SURVEY.md §5 item 2). Spark actions are
  * expensive, so generators produce batches that are checked in one
  * DataFrame pass per property.
  */
class TransformPropertiesSpec extends SparkTestBase {

  /** Run a ScalaCheck property inside a funsuite test. */
  private def check(n: Int)(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  private val valueType = StructType(Seq(
    StructField("k1", IntegerType),
    StructField("parent", StructType(Seq(
      StructField("child", StructType(Seq(
        StructField("k2", StringType),
        StructField("k3", IntegerType)))))))))

  private val fieldName = Gen.oneOf("k1", "parent", "child", "k2", "k3", "zz", "x")
  private val somePath = Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, fieldName))
    .map(_.mkString("."))

  test("property: dropping any nonexistent path is identity") {
    check(20)(Prop.forAll(Gen.listOfN(8, somePath)) { paths =>
      val valid = Set("k1", "parent", "parent.child", "parent.child.k2", "parent.child.k3")
      val bogus = paths.filterNot(valid.contains)
      val out = NestedOps.dropSchema(valueType, bogus.map(NestedOps.parsePath))
      out == valueType
    })
  }

  test("property: dropFieldsCol output type equals dropSchema for any valid path subset") {
    val valid = Seq("k1", "parent.child.k2", "parent.child.k3", "parent.child", "parent")
    check(15)(Prop.forAll(Gen.someOf(valid)) { subset =>
      val paths = subset.toSeq.map(NestedOps.parsePath)
      val in = df(StructType(Seq(StructField("value", valueType))),
        Row(Row(1, Row(Row("x", 2)))))
      val out = in.select(NestedOps.dropFieldsCol(col("value"), valueType, paths).as("value"))
      out.schema("value").dataType == NestedOps.dropSchema(valueType, paths)
    })
  }

  test("property: hoist-then-flatten round-trips for any keep subset") {
    val st = StructType(Seq(
      StructField("a", IntegerType), StructField("b", IntegerType),
      StructField("c", IntegerType)))
    val in = df(StructType(Seq(StructField("v", st))), Row(Row(1, 2, 3)))
    check(10)(Prop.forAll(Gen.someOf(Seq("a", "b", "c"))) { keepSeq =>
      val keep = keepSeq.toSeq
      val hoisted = ExtendedHoistField("v", "inner", keep)(in)
      val vt = hoisted.schema("v").dataType.asInstanceOf[StructType]
      val flat =
        if (!vt.fieldNames.contains("inner")) hoisted.select(col("v.a"), col("v.b"), col("v.c"))
        else {
          val innerFields = vt("inner").dataType.asInstanceOf[StructType].fieldNames
          val cols = Seq("a", "b", "c").map { f =>
            if (innerFields.contains(f)) col(s"v.inner.$f").as(f) else col(s"v.$f").as(f)
          }
          hoisted.select(cols: _*)
        }
      flat.head() == Row(1, 2, 3)
    })
  }

  test("property: to_json ∘ from_json is stable on string→long maps") {
    val kvGen = Gen.listOfN(3, for {
      k <- Gen.identifier.map(_.take(5))
      v <- Gen.chooseNum(-1000000L, 1000000L)
    } yield (k, v))
    check(15)(Prop.forAll(kvGen) { kvs =>
      val distinct = kvs.toMap
      distinct.isEmpty || {
        val json = distinct.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
        val s = spark
        import s.implicits._
        val once = Seq(json).toDF("j")
          .select(to_json(from_json(col("j"), MapType(StringType, LongType))).as("j"))
        val twice = once
          .select(to_json(from_json(col("j"), MapType(StringType, LongType))).as("j"))
        once.head().getString(0) == twice.head().getString(0)
      }
    })
  }

  test("property: rolling_hash Column result equals the reference Scala loop") {
    val strGen = Gen.listOfN(24, Gen.asciiPrintableStr.map(_.take(40)))
    check(5)(Prop.forAll(strGen) { strs =>
      strs.isEmpty || {
        val s = spark
        import s.implicits._
        val got = strs.toDF("t")
          .select(col("t"), RollingHash.rolling_hash(col("t")).as("h"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        strs.forall(str => got(str) == RollingHash.hashBytes(str.getBytes("UTF-8")))
      }
    })
  }
}
