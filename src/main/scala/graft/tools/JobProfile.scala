package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-job/per-stage wall-time attribution for ONE SparkEntry query —
  * the measurement companion the iterative operators need: their final
  * plan is a trivial `Scan ExistingRDD`, so `explain` shows nothing and
  * the cost lives in side jobs (checkpoints, bounded driver scalars,
  * broadcast builds). Prints one line per stage (submit→complete wall,
  * task count, shuffle bytes) and a per-job rollup including the GAP
  * between jobs (driver-side planning/scheduling time, which is the
  * dominant cost of iterative loops at small scale).
  *
  * {{{ sbt 'runMain graft.tools.JobProfile q_hits /root/testdata/sf0.1' }}}
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    case class St(job: Int, stage: Int, name: String, submitted: Long,
                  completed: Long, nTasks: Int, shufWrite: Long, shufRead: Long,
                  runMs: Long, cpuMs: Long, gcMs: Long, deserMs: Long)
    val stages = scala.collection.mutable.ArrayBuffer.empty[St]
    val jobSpan = scala.collection.mutable.LinkedHashMap.empty[Int, (Long, Long)]
    val stageToJob = scala.collection.mutable.HashMap.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobSpan(e.jobId) = (e.time, 0L)
        e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobSpan.get(e.jobId).foreach(s => jobSpan(e.jobId) = (s._1, e.time))
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        stages += St(stageToJob.getOrElse(si.stageId, -1), si.stageId,
          si.name.takeWhile(_ != '\n').take(90),
          si.submissionTime.getOrElse(0L), si.completionTime.getOrElse(0L),
          si.numTasks,
          si.taskMetrics.shuffleWriteMetrics.bytesWritten,
          si.taskMetrics.shuffleReadMetrics.totalBytesRead,
          si.taskMetrics.executorRunTime, si.taskMetrics.executorCpuTime / 1000000,
          si.taskMetrics.jvmGCTime, si.taskMetrics.executorDeserializeTime)
      }
    }
    // warm rep(s) first so JIT/codegen does not pollute the attribution
    (1 until reps).foreach { _ =>
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, sfDir)
      .write.mode("overwrite").format("noop").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // let the async listener bus drain
    println(f"[profile] $name total wall: $wall%.2f s, ${jobSpan.size} jobs, ${stages.size} stages")
    var prevEnd = 0L
    jobSpan.foreach { case (jid, (s, e)) =>
      val gap = if (prevEnd == 0L) 0L else s - prevEnd
      prevEnd = e
      val js = stages.filter(_.job == jid)
      println(f"[profile] job $jid%3d wall ${(e - s) / 1e3}%6.2f s gap-before ${gap / 1e3}%5.2f s stages ${js.size}%2d tasks ${js.map(_.nTasks).sum}%4d")
      js.sortBy(_.submitted).foreach { st =>
        println(f"[profile]   stage ${st.stage}%3d ${(st.completed - st.submitted) / 1e3}%6.2f s tasks ${st.nTasks}%3d run ${st.runMs}%5d cpu ${st.cpuMs}%5d gc ${st.gcMs}%4d deser ${st.deserMs}%5d sw ${st.shufWrite}%8d sr ${st.shufRead}%8d  ${st.name}")
      }
    }
    spark.stop()
  }
}
