package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

class FormatsSpec extends SparkTestBase {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_fmt_$tag").toString + "/out"

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("label", StringType),
    StructField("v", DoubleType)))

  // values chosen to stress text rendering: negative, exponent-heavy,
  // shortest-repr-sensitive doubles, and a delimiter-laden string
  private def sample = df(schema,
    Row(1L, "plain", 123.456),
    Row(2L, "comma, quote \" and tab\there", -0.1),
    Row(3L, "exp", 6.02214076e23),
    Row(4L, "tiny", 1.0000000000000002),
    Row(5L, null, 0.0))

  private def roundTrip(write: String => Unit, read: String => Seq[Row]): Unit = {
    val path = tmp("rt")
    write(path)
    val got = read(path)
    val want = sample.collect().toSeq
    assert(got.map(r => (r.getLong(0), r.isNullAt(1))).toSet ==
      want.map(r => (r.getLong(0), r.isNullAt(1))).toSet)
    val byId = got.map(r => r.getLong(0) -> r).toMap
    want.foreach { w =>
      val g = byId(w.getLong(0))
      if (!w.isNullAt(1)) assert(g.getString(1) == w.getString(1))
      // bit-exact double round trip — java.lang.Double.compare catches
      // a -0.0/0.0 flip too
      assert(java.lang.Double.compare(g.getDouble(2), w.getDouble(2)) == 0,
        s"row ${w.getLong(0)}: ${g.getDouble(2)} != ${w.getDouble(2)}")
    }
  }

  test("CSV round trip is lossless, including shortest-repr doubles") {
    roundTrip(
      p => Formats.writeCsv(sample, p),
      p => Formats.readCsv(spark, p, schema).collect().toSeq)
  }

  test("JSONL round trip is lossless") {
    roundTrip(
      p => Formats.writeJsonl(sample, p),
      p => Formats.readJsonl(spark, p, schema).collect().toSeq)
  }

  test("ORC round trip is lossless and the read side prunes + pushes down") {
    val path = tmp("orc")
    Formats.writeOrc(sample, path)
    roundTrip(_ => (), _ => Formats.readOrc(spark, path).collect().toSeq)
    // columnar read path: a 2-column projection with a filter must show
    // both a pruned ReadSchema and pushed filters in the scan
    val p = Formats.readOrc(spark, path)
      .filter(col("id") > 2L).select("id", "v")
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,2)]"), p)
    assert(p.contains("ReadSchema: struct<id:bigint,v:double>"),
      s"label column must not be read:\n$p")
  }

  test("mergeSchema read unions drifted schemas; pre-evolution rows go null") {
    val path = tmp("evolve")
    val s = spark
    import s.implicits._
    // v1 writer: two columns; v2 writer APPENDS with an added column
    Seq(1L -> "a", 2L -> "b").toDF("id", "label")
      .write.mode("overwrite").parquet(path)
    Seq((3L, "a", 30L), (4L, "c", 40L)).toDF("id", "label", "extra")
      .write.mode("append").parquet(path)
    val merged = Formats.readParquetMerged(spark, path)
    assert(merged.schema.fieldNames.toSet == Set("id", "label", "extra"),
      "union of every file's schema")
    val rows = merged.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(rows == Map(1L -> None, 2L -> None, 3L -> Some(30L), 4L -> Some(40L)),
      "v1 rows surface the added column as NULL, v2 rows keep values")
    // pruning still reaches the scan: a projection that skips the added
    // column must not read it
    val p = merged.select("id", "label").queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema: struct<id:bigint,label:string>"),
      s"added column must not be read when not selected:\n$p")
  }

  test("reads are schema-first: no inference pass, declared dtypes win") {
    val path = tmp("schema")
    Formats.writeCsv(sample, path)
    val asString = StructType(schema.fields.map(f =>
      StructField(f.name, StringType)))
    val got = Formats.readCsv(spark, path, asString)
    assert(got.schema.fields.forall(_.dataType == StringType),
      "declared schema applies verbatim — nothing re-inferred")
    assert(got.count() == 5)
  }
}
