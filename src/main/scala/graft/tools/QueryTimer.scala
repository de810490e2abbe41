package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-iteration helper: time one or more SparkEntry queries N times in
  * a warm session and optionally dump their formatted plans. A
  * comma-separated name list interleaves the queries per rep —
  * back-to-back in ONE JVM, which is the honest way to compare two
  * flavors of the same pipeline (same JIT state, same OS page cache).
  *
  * {{{ sbt 'runMain graft.tools.QueryTimer dedup_minhash_pairs,dedup_pairs_md5 /root/testdata/sf0.1 5' }}}
  */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val reps = if (args.length > 2) args(2).toInt else 3
    val explain = args.contains("explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (explain) names.foreach(n =>
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted"))
    // `final` prints the post-execution adaptive plan — the only view
    // that shows AQE's runtime stage reuse (ReusedExchange nodes never
    // appear in the static formatted plan when AQE is on)
    if (args.contains("final")) names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      // collect through the df's OWN QueryExecution (a write spawns a
      // fresh one and leaves this plan un-finalized)
      df.collect()
      println(s"[timer] $n final plan:\n${df.queryExecution.executedPlan}")
    }
    (1 to reps).foreach { i =>
      names.foreach { name =>
        // same honesty rule as Bench: queries that persist intermediates
        // must not serve later reps from the cache
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        println(f"[timer] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
