package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-evidence probe for [[graft.operators.Similarity.semDedup]]: runs
  * semantic dedup over a large embeddings table and reports timing,
  * cluster-occupancy stats, and the flagged count. The point is the
  * `nlist` sizing guidance from the scaladoc: in-cluster work is
  * quadratic, so cells must be kept partition-sized — compare
  * `nlist=8` (bench-scale default) vs e.g. 256 on a 100× corpus.
  *
  * {{{ SPARK_GRAFT_CPUS=32 sbt 'runMain graft.tools.SemDedupProbe /tmp/sf01_x100 256 0.98 trained' }}}
  *
  * `trained` selects the k-means quantizer
  * ([[graft.operators.Similarity.trainIvfCentroids]]); `refined` adds the
  * executor-side full-corpus Lloyd refinement
  * ([[graft.operators.Similarity.trainIvfCentroidsDistributed]]).
  * On label-clustered corpora (like this testdata: ~10 Gaussian blobs)
  * the data-INDEPENDENT fixed quantizer funnels each whole blob into one
  * cell — 20k-row hot cells → 10⁸-pair quadratic work per cell — while
  * the trained quantizer splits dense regions across many cells and
  * keeps them partition-sized. That contrast is the probe's point.
  */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf01_x100"
    val nlist = if (args.length > 1) args(1).toInt else 256
    val threshold = if (args.length > 2) args(2).toDouble else 0.98
    val trained = args.contains("trained")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val dim = graft.operators.Similarity.vecDim(e, "embedding")
    val t0 = System.nanoTime()
    val cents =
      if (args.contains("refined"))
        graft.operators.Similarity.trainIvfCentroidsDistributed(e, "embedding", nlist)
      else if (trained) graft.operators.Similarity.trainIvfCentroids(e, "embedding", nlist)
      else graft.operators.Similarity.fixedCentroids(nlist, dim, seed = 7L)
    val tracker = new graft.operators.CacheTracker
    val out = graft.operators.Similarity.semDedup(e, "vec_id", "embedding",
      cents, threshold, tracker = tracker)
    val byFlag = out.groupBy(col("is_semdup")).count()
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    val secs = (System.nanoTime() - t0) / 1e9
    val occ = out.groupBy(col("cluster")).count()
      .agg(max(col("count")).as("mx"), expr("percentile(count, 0.5)").as("med"))
      .head
    tracker.release()
    println(f"[semdedupprobe] dir=$dir n=${byFlag.values.sum} nlist=$nlist " +
      f"threshold=$threshold flagged=${byFlag.getOrElse(true, 0L)} " +
      f"maxCluster=${occ.getLong(0)} medianCluster=${occ.getDouble(1)}%.0f " +
      f"secs=$secs%.2f")
    spark.stop()
  }
}
