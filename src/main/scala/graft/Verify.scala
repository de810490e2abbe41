package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Failures are LOUD (VERDICT r9 #2): a query that throws still leaves a
  * trace in the artifact — `failed.json` maps query name → first exception
  * line (empty `{}` on a healthy run). Without it, a broken query merely
  * SHRINKS the correctness file, which reads as "all green" unless the
  * reader counts rows against the previous round.
  */
object Verify {

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL (or an exception message) would
    * otherwise make the driver's json.load fail and silently zero the
    * round's correctness.
    */
  def jsonQuote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def jsonObject(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${jsonQuote(k)}: ${jsonQuote(v)}" }
      .mkString("{", ",", "}")

  /** One exception-summary contract for every artifact (Verify AND
    * Bench): first 3 lines joined by " | ", capped at 400 chars — long
    * enough for Spark's multi-line DATATYPE_MISMATCH payloads, short
    * enough for a one-line-per-query artifact. (Bench used to keep only
    * the first line, so those artifacts lost the payload — ADVICE r10.)
    */
  def errorSummary(e: Throwable): String =
    s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage)}"
      .linesIterator.take(3).mkString(" | ").take(400)

  /** Run each query, write its result under `outDir/<name>`, and return
    * the failure map (name → exception summary) — which the caller MUST
    * persist; a dropped failure is the silent-shrink bug all over again.
    */
  def runQueries(
      spark: SparkSession,
      queries: Map[String, (SparkSession, String) => DataFrame],
      sfDir: String,
      outDir: String): Map[String, String] = {
    new java.io.File(outDir).mkdirs()
    queries.flatMap { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        None
      } catch { case e: Throwable =>
        val msg = errorSummary(e)
        System.err.println(s"[verify] $name failed: $msg")
        Some(name -> msg)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query names (fast local iteration
    // on a subset; the driver always runs the full surface)
    val (sfDir, outDir, only) = args match {
      case Array(s, o)    => (s, o, None)
      case Array(s, o, f) => (s, o, Some(f.split(",").toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val failed = runQueries(spark, selected, sfDir, outDir)
    Files.writeString(Paths.get(s"$outDir/failed.json"), jsonObject(failed))
    if (failed.nonEmpty)
      System.err.println(s"[verify] ${failed.size}/${selected.size} queries FAILED: " +
        failed.keys.toSeq.sorted.mkString(", "))
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${jsonQuote(k)}: ${jsonQuote(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
