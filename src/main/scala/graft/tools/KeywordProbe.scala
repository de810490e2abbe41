package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Measures the scaladoc claim behind [[TextAnalysis.keywordTags]]: the
  * exploded-token broadcast join costs one corpus scan regardless of
  * term-list size, while the regex-alternation formulation
  * (`regexp_count(text, '\b(t1|t2|...)\b')`-style) scales with the
  * alternation's NFA and stops being viable at real blocklist sizes.
  * Both sides produce per-doc totals over the same synthetic term list
  * (every 3rd vocabulary token of the corpus, padded with misses), and
  * equality of the grand totals is asserted per round so the comparison
  * never drifts into measuring different work.
  *
  * {{{ sbt 'runMain graft.tools.KeywordProbe /root/testdata/sf0.1' }}}
  */
object KeywordProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    // real corpus tokens so both sides do real matching work, padded
    // with never-occurring terms to reach each size
    val vocab = TextAnalysis.topTokens(docs, "text", 1000)
      .collect().map(_.getString(0)).toSeq
    def termList(n: Int): Seq[String] = {
      val hits = vocab.zipWithIndex.collect { case (t, i) if i % 3 == 0 => t }
      (hits ++ (0 until n).map(i => s"zz_miss_$i")).take(n) match {
        case ts if ts.size < n => ts ++ (ts.size until n).map(i => s"zz_pad_$i")
        case ts => ts
      }
    }

    def timed(tag: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
      r
    }

    (1 to 2).foreach { rep =>
      println(s"[probe] === rep $rep ===")
      for (n <- Seq(10, 100, 1000, 10000)) {
        val terms = termList(n)
        val joined = timed(s"join  n=$n")(
          TextAnalysis.keywordTags(docs, "doc_id", "text", terms.toDF("term"))
            .agg(sum("n_hits")).collect()(0).getLong(0))
        // the regex alternation: one pattern with n branches, counted
        // per doc over the same normalized text. Quoted terms (all \w
        // here) with explicit boundary anchors.
        if (n <= 1000) { // 10k-branch pattern: minutes-per-task territory
          val pat = "(?<=^| )(" + terms.map(java.util.regex.Pattern.quote)
            .mkString("|") + ")(?=$| )"
          val rex = timed(s"regex n=$n")(
            docs.select(size(regexp_extract_all(
                lower(TextAnalysis.normWs(col("text"))), lit(pat), lit(0)))
              .cast("long").as("c"))
              .agg(sum("c")).collect()(0).getLong(0))
          require(rex == joined, s"counts diverged: regex $rex vs join $joined")
        } else println(s"[probe] regex n=$n: skipped (alternation not viable)")
      }
    }
    spark.stop()
  }
}
