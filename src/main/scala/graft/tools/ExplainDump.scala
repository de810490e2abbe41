package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for a set of SparkEntry queries to files —
  * the plans/rNN before/after evidence for optimization rounds.
  *
  * {{{
  * sbt 'runMain graft.tools.ExplainDump /root/testdata/sf0.1 plans/r19 _after q_pagerank,q_hits'
  * }}}
  *
  * Writes `<outDir>/<query><suffix>.txt` per query. Uses the same session
  * shape as Bench (master/local, shuffle partitions = SPARK_GRAFT_CPUS) so
  * the dumped plans match what the bench executes.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args(3).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val txt = try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      } catch { case e: Throwable =>
        s"ERROR building $name: ${e.getClass.getName}: ${e.getMessage}"
      }
      Files.writeString(Paths.get(s"$outDir/$name$suffix.txt"), txt)
      println(s"[explain] wrote $outDir/$name$suffix.txt")
    }
    spark.stop()
  }
}
