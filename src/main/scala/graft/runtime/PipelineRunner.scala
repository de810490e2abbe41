package graft.runtime

import java.io.FileInputStream
import java.util.Properties

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.config.ConnectProps

/** Batch runner: the engine's counterpart of a Connect worker running a
  * connector properties file (`README.md:12-16`) — read a source, apply the
  * declared `transforms=...` chain, write a sink.
  *
  * {{{
  * sbt "runMain graft.runtime.PipelineRunner \
  *   --input /root/testdata/sf0.001/events.parquet \
  *   --props chain.properties --output /tmp/out --show 5"
  * }}}
  *
  * Sources/sinks: `parquet` (default), `json`, `csv`, `console` (output
  * only). The streaming twin is [[StreamRunner]] — same chain compiles
  * unchanged onto a streaming DataFrame.
  */
object PipelineRunner {

  def run(spark: SparkSession, input: String, propsFile: Option[String],
          inlineProps: Map[String, String]): DataFrame = {
    val props = propsFile.map(loadProps).getOrElse(Map.empty) ++ inlineProps
    val fn = ConnectProps.compile(props)
    spark.conf.set(graft.sources.Tables.NanosConf, "true")
    // same source-boundary contract as the query surface: whatever
    // physical ts encoding the user's writer chose (TIMESTAMP,
    // TIMESTAMP_NTZ, legacy TIMESTAMP(NANOS) → BIGINT), downstream sees
    // one logical type — BIGINT epoch nanos
    fn(graft.sources.Tables.normalizeEventTime(spark.read.parquet(input)))
  }

  def loadProps(path: String): Map[String, String] = {
    val p = new Properties()
    val in = new FileInputStream(path)
    try p.load(in) finally in.close()
    p.asScala.toMap
  }

  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val input = opts.getOrElse("--input",
      if (opts.contains("--sql")) "" else sys.error("--input <parquet path> is required"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName("graft-pipeline")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // --input may point at a TIMESTAMP(NANOS) parquet (the pre-r9
      // testdata encoding), unreadable without this legacy conf
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // the library's official registration path: custom planner strategy
      // + SQL functions, same as spark.sql.extensions=graft.GraftExtensions
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      if (opts.contains("--sql")) {
        // SQL mode: register the star schema (--tables <sfDir>) as views
        // and run arbitrary SQL text — extension functions (rolling_hash)
        // are available because the session is built withExtensions
        val sfDir = opts.getOrElse("--tables",
          sys.error("--tables <sfDir> is required with --sql"))
        val registered = graft.sources.Tables.registerViews(spark, sfDir)
        println(s"[graft] registered views: ${registered.mkString(", ")}")
        val out = spark.sql(opts("--sql"))
        out.show(opts.get("--show").map(_.toInt).getOrElse(20), truncate = false)
        opts.get("--output").foreach { dir =>
          out.write.mode("overwrite").parquet(dir)
          println(s"[graft] wrote ${spark.read.parquet(dir).count()} rows to $dir")
        }
      } else if (opts.contains("--stream")) {
        // streaming mode: file-stream source → same chain → parquet sink
        val outDir = opts.getOrElse("--output",
          sys.error("--output <dir> is required with --stream"))
        val ckpt = opts.getOrElse("--checkpoint", outDir + "_ckpt")
        spark.conf.set(graft.sources.Tables.NanosConf, "true")
        val schema = spark.read.parquet(input).schema
        // normalizeEventTime is a plain projection, so it composes onto
        // the streaming DataFrame unchanged — same encoding immunity as
        // the batch path above
        val src = graft.sources.Tables.normalizeEventTime(
          graft.streaming.StreamRunner.fileSource(spark, input, schema))
        val props = opts.get("--props").map(loadProps).getOrElse(Map.empty)
        val q = graft.streaming.StreamRunner.fileSink(
          graft.streaming.StreamRunner.applyChain(src, props), outDir, ckpt)
        q.awaitTermination()
        println(s"[graft] stream wrote ${spark.read.parquet(outDir).count()} rows to $outDir")
      } else {
        val out = run(spark, input, opts.get("--props"), Map.empty)
        opts.get("--show").foreach(n => out.show(n.toInt, truncate = false))
        opts.get("--explain").foreach(mode => out.explain(mode))
        opts.get("--output").foreach { dir =>
          out.write.mode("overwrite").parquet(dir)
          println(s"[graft] wrote ${spark.read.parquet(dir).count()} rows to $dir")
        }
      }
    } finally spark.stop()
  }
}
