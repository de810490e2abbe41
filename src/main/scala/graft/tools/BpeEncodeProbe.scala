package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Encode-path cost of the two BPE encoders (r11): the chained-replace
  * column encoder ([[TextAnalysis.bpeEncode]], codegen, depth ≤ 8) vs the
  * per-partition deep encoder ([[TextAnalysis.bpeEncodeDeep]], pass-gated
  * symbol arrays, unbounded depth) — same contract, measured at equal
  * depth for the apples-to-apples overhead of leaving codegen, then at
  * tokenizer-realistic depths only the deep path can reach.
  *
  * Merges are trained DRIVER-LOCALLY here with the same greedy
  * global-pair-count algebra as [[TextAnalysis.bpeTrain]] (max count, tie
  * to the lexicographically smaller pair, each round one left-to-right
  * non-overlapping pass) over the same deterministic 25% sample
  * q_bpe_train uses — the distributed trainer is driver-bounded at 8
  * rounds by design, and the probe needs hundreds of REAL, firing merges;
  * a local trainer over a bounded collected sample is measurement
  * scaffolding, not an engine path. Warm minimum of `reps`, noop sink,
  * as in Bench/QueryTimer.
  *
  * Usage: {{{ sbt 'runMain graft.tools.BpeEncodeProbe /root/testdata/sf0.1 [reps]' }}}
  */
object BpeEncodeProbe {

  /** One LTR non-overlapping merge pass (the engine contract, locally). */
  private def mergePass(toks: Array[String], a: String, b: String,
                        sep: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var j = 0
    while (j < toks.length) {
      if (j < toks.length - 1 && toks(j) == a && toks(j + 1) == b) {
        out += (a + sep + b); j += 2
      } else { out += toks(j); j += 1 }
    }
    out.toArray
  }

  private def trainLocal(texts: Seq[String], nMerges: Int): Seq[(String, String)] = {
    val sep = "\u001f"
    var docs = texts.map(_.toLowerCase.trim.replaceAll("\\s+", " ")
      .split(" ")).toArray
    val learned = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var k = 0
    var stop = false
    while (k < nMerges && !stop) {
      val counts = new java.util.HashMap[String, Long]()
      docs.foreach { t =>
        var i = 0
        while (i < t.length - 1) {
          counts.merge(t(i) + " " + t(i + 1), 1L, _ + _); i += 1
        }
      }
      if (counts.isEmpty) stop = true
      else {
        var bestPair: String = null
        var bestCnt = -1L
        counts.forEach { (p, c) =>
          if (c > bestCnt || (c == bestCnt && p < bestPair)) {
            bestPair = p; bestCnt = c
          }
        }
        val Array(a, b) = bestPair.split(" ", 2)
        learned += ((a, b))
        docs = docs.map(mergePass(_, a, b, sep))
        k += 1
      }
    }
    learned.toSeq
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val sampleTexts = d.filter(col("doc_id") % 4 === 0)
      .select(col("text")).collect().map(_.getString(0)).toSeq
    val t0 = System.nanoTime()
    val merges = trainLocal(sampleTexts, 512)
    println(f"[bpeencode] local train: ${merges.size}%d merges over " +
      f"${sampleTexts.size}%d docs in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    def time(label: String, run: () => Unit): Double = {
      run() // warmup
      val times = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        val s = System.nanoTime()
        run()
        (System.nanoTime() - s) / 1e9
      }
      println(f"[bpeencode] $label%-16s warm_min=${times.min}%6.2f s")
      times.min
    }

    val rows = Seq(
      "chain@8" -> time("chain@8", () =>
        TextAnalysis.bpeEncode(d, "doc_id", "text", merges.take(8))
          .write.mode("overwrite").format("noop").save()),
      "deep@8" -> time("deep@8", () =>
        TextAnalysis.bpeEncodeDeep(d, "doc_id", "text", merges.take(8))
          .write.mode("overwrite").format("noop").save())) ++
      Seq(64, 256, 512).map { n =>
        s"deep@$n" -> time(s"deep@$n", () =>
          TextAnalysis.bpeEncodeDeep(d, "doc_id", "text", merges.take(n))
            .write.mode("overwrite").format("noop").save())
      }
    println("[bpeencode] | encoder | warm min s |")
    rows.foreach { case (l, t) => println(f"[bpeencode] | $l | $t%.2f |") }
    spark.stop()
  }
}
