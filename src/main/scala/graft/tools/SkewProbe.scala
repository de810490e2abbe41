package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec, QueryStageExec}
import org.apache.spark.sql.functions._

/** Scale-evidence probe for AQE skew-join splitting: joins a corpus with
  * a PLANTED hot key (20% of all rows collapse onto key 0) against a
  * uniform dimension, forcing a shuffle join, and reports how AQE split
  * the hot partition at runtime — the measured counterpart to
  * `SkewJoinSpec`'s plan assertion, meant to run on the 100× corpus.
  *
  * {{{ SPARK_GRAFT_CPUS=32 sbt 'runMain graft.tools.SkewProbe /tmp/sf01_x100' }}}
  *
  * The skew threshold defaults to 1 MB (vs production's 256 MB) with the
  * PRODUCTION skew factor (2× median): the probe corpus shuffles ~2 GB
  * less than a real hot table, so the threshold scales down by the same
  * ratio while the factor semantics — hot partition more than twice the
  * median — stay exactly what a 100 TB cluster would evaluate.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf01_x100"
    val thresh = if (args.length > 1) args(1) else "1MB"
    val factor = if (args.length > 2) args(2) else "2"
    val explain = args.contains("explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", factor)
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", thresh)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", thresh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.sources.Tables.documents(spark, dir)
    val left = docs.select(
      when(col("doc_id") % 5 =!= 0, col("doc_id") % 1000).otherwise(0L).as("k"),
      col("text"))
    val rightK = spark.range(1000L).select(col("id").as("k"), (col("id") * 7).as("rv"))
    val joined = left.join(rightK, "k")
      .agg(count(lit(1)).as("n"), sum(length(col("text"))).as("text_bytes"))

    val t0 = System.nanoTime()
    val row = joined.collect().head
    val secs = (System.nanoTime() - t0) / 1e9

    def reads(p: SparkPlan): Seq[AQEShuffleReadExec] = p match {
      case a: AdaptiveSparkPlanExec => reads(a.executedPlan)
      case q: QueryStageExec => reads(q.plan)
      case r: AQEShuffleReadExec => r +: r.children.flatMap(reads)
      case other => other.children.flatMap(reads)
    }
    val rs = reads(joined.queryExecution.executedPlan)
    val skewedParts = rs.flatMap(_.metrics.get("numSkewedPartitions")).map(_.value).sum
    val skewSplits = rs.flatMap(_.metrics.get("numSkewedSplits")).map(_.value).sum
    val planStr = joined.queryExecution.executedPlan.toString
    if (explain) println(planStr)
    println(f"[skewprobe] dir=$dir thresh=$thresh factor=$factor rows=${row.getLong(0)} " +
      f"textBytes=${row.getLong(1)} secs=$secs%.2f " +
      f"skewedPartitions=$skewedParts skewSplits=$skewSplits " +
      f"planHasSkewFlag=${planStr.contains("skew=true")}")
    spark.stop()
  }
}
