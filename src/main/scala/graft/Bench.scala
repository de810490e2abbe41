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
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try fn(spark, warmDir).write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
      // 3 timed runs: report the min (stable signal, immune to stray
      // JIT/GC pauses — observed 0.4s queries reading as 7s once per
      // session) AND the p50 (damps min-lottery under machine load)
      // only SUCCESSFUL runs enter the samples — a fast abort would
      // otherwise pose as the best time; both maps carry the negative
      // failure marker so neither reads as healthy
      var times = List.empty[Double]
      var failDur = 0.0
      var ok = true
      var i = 0
      while (i < 3 && ok) {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          times ::= (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          errors ::= s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}"
          failDur = (System.nanoTime() - t0) / 1e9
          ok = false
        }
        i += 1
      }
      val sorted = times.sorted
      val best = if (sorted.nonEmpty) sorted.head else failDur
      val p50 = if (sorted.nonEmpty) sorted(sorted.size / 2) else failDur
      (name, if (ok) best else -best, if (ok) p50 else -p50)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val qsP50 = results.map { case (k, _, p) => "\"" + k + "\":" + f"$p%.3f" }
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
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs%s,"queries_p50":$qsP50%s,"failed":$errJson%s,"sf":"$sfDir%s"}""")
    spark.stop()
  }
}
