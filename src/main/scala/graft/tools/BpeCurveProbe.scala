package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Per-round cost curve of [[TextAnalysis.bpeTrain]] (VERDICT r8 task 5):
  * time the full training loop at nMerges = 2/4/6/8 over the same
  * deterministic 25% sample q_bpe_train uses, to pin whether the
  * deepening per-round replace chain (round k re-evaluates k merges over
  * the corpus) is linear or quadratic in practice at sf0.1. Warm minimum
  * of `reps` timed runs per point, caches cleared between runs, as in
  * Bench/QueryTimer.
  *
  * Usage: {{{ sbt 'runMain graft.tools.BpeCurveProbe /root/testdata/sf0.1 [reps]' }}}
  */
object BpeCurveProbe {
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
    // the exact q_bpe_train input: deterministic 25% sample of documents
    val sample = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .filter(col("doc_id") % 4 === 0)

    val rows = Seq(2, 4, 6, 8).map { n =>
      spark.catalog.clearCache()
      TextAnalysis.bpeTrain(sample, "doc_id", "text", n).collect(): Unit // warmup
      val times = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        TextAnalysis.bpeTrain(sample, "doc_id", "text", n).collect(): Unit
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[bpecurve] nMerges=$n%d warm_min=${times.min}%6.2f s " +
        f"per_round=${times.min / n}%5.2f s")
      (n, times.min)
    }
    println("[bpecurve] | nMerges | warm s | s/round | marginal s/round |")
    rows.zip((0, 0.0) +: rows.init).foreach { case ((n, t), (pn, pt)) =>
      val marginal = if (n > pn && pn > 0) (t - pt) / (n - pn) else t / n
      println(f"[bpecurve] | $n | $t%.2f | ${t / n}%.2f | $marginal%.2f |")
    }
    spark.stop()
  }
}
