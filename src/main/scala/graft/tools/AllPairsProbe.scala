package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{AllPairs, Dedup}

/** Stage-cost probe for the prefix-filtered all-pairs cosine join:
  * materializes each pipeline stage separately (counts force the work)
  * and times it, so the expensive stage is measured, not guessed.
  *
  * {{{ sbt 'runMain graft.tools.AllPairsProbe /root/testdata/sf0.1 700 3' }}}
  */
object AllPairsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val tPerMille = if (args.length > 1) args(1).toInt else 700
    val k = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.sources.Tables.documents(spark, sfDir)
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
      r
    }

    (1 to 2).foreach { rep =>
      println(s"[probe] === rep $rep ===")
      val elems = Dedup.explodedShingles(docs, "doc_id", "text", k)
        .select(col("doc_id").as("__id"), col("__sh").as("__el")).distinct()
      timed("elems (distinct id,el)")(elems.count())
      val elDf = elems.groupBy("__el").agg(count(lit(1)).as("__df"))
      timed("elDf (element df)")(elDf.count())
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("__id").orderBy("__df", "__el")
      val t2 = tPerMille.toLong * tPerMille
      val sizes = elems.groupBy("__id").agg(count(lit(1)).as("__n"))
      val rankedRows = elems.join(elDf, "__el").join(sizes, "__id")
        .select(col("__id"), col("__el"), col("__n"),
          row_number().over(w).as("__rn"))
      val prefix = rankedRows.filter(
        col("__rn") <= col("__n") - expr(s"($t2 * __n + 999999) div 1000000") + 1)
      timed("prefix rows")(prefix.count())
      val raw = prefix.select(col("__id").as("id_a"), col("__n").as("n_a"),
          col("__rn").as("__ra"), col("__el"))
        .join(prefix.select(col("__id").as("id_b"), col("__n").as("n_b"),
          col("__rn").as("__rb"), col("__el")), Seq("__el"))
        .filter(col("id_a") < col("id_b"))
        .filter(lit(1000000L) * least(col("n_a"), col("n_b")) >=
          lit(t2) * greatest(col("n_a"), col("n_b")))
      timed("raw candidates (pre-position-filter)")(raw.count())
      val cand = raw
        .withColumn("__ub",
          lit(1L) + least(col("n_a") - col("__ra"), col("n_b") - col("__rb")))
        .filter(lit(1000000L) * col("__ub") * col("__ub") >=
          lit(t2) * col("n_a") * col("n_b"))
        .select("id_a", "id_b", "n_a", "n_b")
      timed("candidates (position-filtered)")(cand.count())
      val candD = cand.distinct()
      timed("candidates (distinct)")(candD.count())
      timed("full operator")(AllPairs
        .cosinePairs(docs, "doc_id", "text", tPerMille, k).count())
    }
    spark.stop()
  }
}
