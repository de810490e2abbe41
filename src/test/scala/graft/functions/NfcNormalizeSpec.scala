package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** All non-ASCII content in this spec is spelled as unicode escapes
  * so the composed-vs-decomposed distinction survives editors and
  * diff tools: a raw pasted character could silently be either form.
  */
class NfcNormalizeSpec extends SparkTestBase {

  private val decomposed = "A\u030Angstro\u0308m" // A+ring, o+diaeresis
  private val composed = "\u00C5ngstr\u00F6m" // precomposed twins

  private def df = {
    val s = spark
    import s.implicits._
    Seq(
      (0L, decomposed),
      (1L, "caf\u00E9 already composed"),
      (2L, ""),
      (3L, null: String))
      .toDF("id", "t")
  }

  test("composes decomposed sequences exactly like java.text.Normalizer") {
    val got = df.select(col("id"), NfcNormalize.nfc_normalize(col("t")).as("n"))
      .orderBy("id").collect()
    def ref(s: String) =
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    assert(got(0).getString(1) == composed)
    assert(got(0).getString(1) == ref(decomposed))
    assert(got(1).getString(1) == "caf\u00E9 already composed",
      "already-NFC input unchanged")
    assert(got(2).getString(1) == "")
    assert(got(3).isNullAt(1), "null propagates")
  }

  test("SQL registration + codegen stage over a real table") {
    NfcNormalize.register(spark)
    df.createOrReplaceTempView("nfc_input")
    val viaSql = spark.sql(
      "SELECT nfc_normalize(t) AS n FROM nfc_input WHERE id = 0").collect()
    assert(viaSql.head.getString(0) == composed)
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = docs.select(NfcNormalize.nfc_normalize(col("text")).as("n"))
    assert(out.count() == 500)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("nfc_normalize")),
      s"expected nfc_normalize inside a codegen stage:\n$plan")
  }

  test("normalizeText chain: NFC, NBSP, control strip, collapse, trim in order") {
    val s = spark
    import s.implicits._
    val in = Seq(
      // decomposed A+ring, NBSP-joined "bc", BEL, vertical tab, tab,
      // double space, tail space: composes, comes apart, vanishes (BEL
      // and VT via the control strip, which runs BEFORE the collapse --
      // Java's \s matches VT but RE2's does not), collapses, trims
      (0L, "A\u030A \u00A0bc\u0007\u000B\t e\u0301  end "),
      (1L, "ab")).toDF("id", "t")
    val got = in.select(col("id"),
      graft.operators.TextAnalysis.normalizeText(col("t")).as("n"))
      .orderBy("id").collect()
    assert(got(0).getString(1) == "\u00C5 bc \u00E9 end")
    assert(got(1).getString(1) == "ab")
  }

  test("normalizeText is idempotent over adversarial char soup") {
    // the production property: re-running the cleanup over already-clean
    // data must be a no-op, or every pipeline re-run would rewrite the
    // corpus. Seeded palette mixes base chars, combining marks, NBSP,
    // controls, and whitespace runs.
    val palette = "ab c" + "\u030A" + "\u0301" + "\u00A0" + "\u0007" +
      "\u000B" + "\t" + "\u00C5" + "\u00E9" + "  "
    val rnd = new scala.util.Random(20260814L)
    val samples = Seq.tabulate(200) { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(24))(
        palette(rnd.nextInt(palette.length))).mkString)
    }
    val s2 = spark
    import s2.implicits._
    val df = samples.toDF("id", "t")
    import graft.operators.TextAnalysis.normalizeText
    val bad = df.select(col("id"),
        normalizeText(col("t")).as("once"),
        normalizeText(normalizeText(col("t"))).as("twice"))
      .filter(col("once") =!= col("twice"))
      .collect()
    assert(bad.isEmpty,
      s"normalizeText not idempotent on: ${bad.take(3).mkString("; ")}")
  }
}
