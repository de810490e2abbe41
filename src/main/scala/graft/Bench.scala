package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Failures are reported distinctly (negative
  * timing + error list) instead of masquerading as fast runs.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var errors = List.empty[String]
    // Untimed warmup at the smallest SF: JIT/codegen warmup costs ~10s for
    // the heaviest plan shapes and would otherwise dominate the timings of
    // what are sub-second queries (measured: 9s cold → 0.9s warm).
    val warmDir = "/root/testdata/sf0.001"
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
    queries.foreach { case (_, fn) =>
      try fn(spark, warmDir).write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
    }
    // 3 timed reps, run ROUND-ROBIN across queries (rep 1 of everything,
    // then rep 2, then rep 3) rather than back-to-back per query: a
    // transient machine-load burst then inflates one rep of many queries
    // instead of all reps of one query, so neither the min nor the p50 of
    // any single query can be poisoned by a single burst (r3 recorded a
    // 1.4s query at 45s that way). Report min (stable signal, immune to
    // stray JIT/GC pauses) AND p50 (damps min-lottery under load). Only
    // SUCCESSFUL runs enter the samples — a fast abort would otherwise
    // pose as the best time; failures carry a negative marker so they
    // never read as healthy.
    val times = scala.collection.mutable.Map(queries.map(_._1 -> List.empty[Double]): _*)
    val failed = scala.collection.mutable.Map.empty[String, Double]
    for (_ <- 0 until 3; (name, fn) <- queries if !failed.contains(name)) {
      // queries that persist intermediates (dedup_pairs_md5, q_tfidf)
      // would otherwise serve reps 2-3 from the cache — clearing between
      // reps keeps every rep an honest full-query measurement and bounds
      // cache residency across the run
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        times(name) ::= (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        errors ::= s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}"
        failed(name) = (System.nanoTime() - t0) / 1e9
      }
    }
    val results = queries.map { case (name, _) =>
      val sorted = times(name).sorted
      failed.get(name) match {
        case Some(d) => (name, -d, -d)
        case None => (name, sorted.head, sorted(sorted.size / 2))
      }
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map { case (_, v, _) => math.abs(v) }.sum
    // escape like Verify.q(): control chars in exception messages (plan
    // dumps contain newlines) would otherwise break the one-line JSON
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val errJson = errors.map(e => "\"" + esc(e) + "\"").mkString("[", ",", "]")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs%s,"failed":$errJson%s,"sf":"$sfDir%s"}""")
    // The harness that records this run keeps only the LAST 2000 chars of
    // stdout, and 101 query names alone are ~1800 chars of JSON — the head
    // of the contract line above is unavoidably cut (p50 map dropped this
    // round for the same reason; min is the stable signal). So re-emit
    // every min-timing once more in the densest self-describing form that
    // fits the window whole: `name=centiseconds`, space-separated (~1750
    // chars for 101 queries vs ~2290 as JSON). Failures keep their
    // negative marker. The JSON contract line stays authoritative; this
    // line is the lossless (10 ms resolution) backstop for tail-window
    // readers.
    println(results.map { case (k, v, _) => s"$k=${math.round(v * 100)}" }
      .mkString("BENCH_ALL_CENTISEC ", " ", ""))
    spark.stop()
  }
}
