package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe: the window-based codegen shingle stage
  * ([[graft.operators.Dedup.explodedShingles]]) vs a typed mapPartitions
  * tokenizer producing the same (id, shingle) rows, measured through the
  * SAME downstream md5 signature aggregate. Interleaved in one JVM.
  *
  * {{{ sbt 'runMain graft.tools.ShingleProbe /root/testdata/sf0.1 5' }}}
  */
object ShingleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))

    def sigOf(sh: DataFrame): DataFrame = {
      val aggs = (0 until 8).map(i =>
        min(substring(col("__d"), i * 4 + 1, 4)).as(s"mh$i"))
      sh.select(col("doc_id"), md5(col("__sh")).as("__d"))
        .groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
    }

    val current = () => sigOf(graft.operators.Dedup.explodedShingles(
      docs, "doc_id", "text", 3))

    val mapped = () => {
      val k = 3
      val p = spark.sparkContext.defaultParallelism
      val sh = docs.repartition(p, col("doc_id"))
        .select(col("doc_id").cast("long"), col("text"))
        .as[(Long, String)]
        .mapPartitions { it =>
          val ws = java.util.regex.Pattern.compile("\\s+")
          it.flatMap { case (id, text) =>
            if (text == null) Iterator.empty
            else {
              val collapsed = ws.matcher(text).replaceAll(" ")
              // trim spaces only (Column trim semantics), then lower with
              // the UTF8String two-path rule (ascii fast path, else JVM)
              var s0 = 0; var e0 = collapsed.length
              while (s0 < e0 && collapsed.charAt(s0) == ' ') s0 += 1
              while (e0 > s0 && collapsed.charAt(e0 - 1) == ' ') e0 -= 1
              val t = collapsed.substring(s0, e0)
              var ascii = true; var i = 0
              while (i < t.length && ascii) { if (t.charAt(i) > 127) ascii = false; i += 1 }
              val norm = if (ascii) {
                val arr = t.toCharArray
                var j = 0
                while (j < arr.length) {
                  val c = arr(j); if (c >= 'A' && c <= 'Z') arr(j) = (c + 32).toChar; j += 1
                }
                new String(arr)
              } else t.toLowerCase
              val toks = norm.split(" ", -1)
              if (toks.length < k) Iterator.single((id, norm))
              else {
                val sb = new StringBuilder
                (0 to toks.length - k).iterator.map { s =>
                  sb.setLength(0)
                  var j = 0
                  while (j < k) { if (j > 0) sb.append(' '); sb.append(toks(s + j)); j += 1 }
                  (id, sb.toString)
                }
              }
            }
          }
        }.toDF("doc_id", "__sh")
      sigOf(sh)
    }

    (1 to reps).foreach { r =>
      Seq("current" -> current, "mapped" -> mapped).foreach { case (nm, f) =>
        val t0 = System.nanoTime()
        f().write.mode("overwrite").format("noop").save()
        println(f"[probe] $nm rep $r: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    // equality check: both produce identical signature tables
    val a = current().orderBy("doc_id").collect().map(_.toString)
    val b = mapped().orderBy("doc_id").collect().map(_.toString)
    println(s"[probe] rows ${a.length}/${b.length} equal=${a.sameElements(b)}")
    spark.stop()
  }
}
