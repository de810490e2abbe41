package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main for the minhash pipeline (dev aid). */
object ProbeMinhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    d.count()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val ex = graft.operators.Dedup.explodedShingles(d, "doc_id", "text", 3)
    time("shingles count 1")(ex.count())
    time("shingles count 2")(ex.count())
    val aggs = (0 until 8).map(s =>
      min(substring(md5(concat(lit(s + ":"), col("__sh"))), 1, 16)).as(s"mh$s"))
    time("agg 1")(ex.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").format("noop").save())
    time("agg 2")(ex.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").format("noop").save())
    time("full query 1")(graft.SparkEntry.queries("dedup_minhash")(spark, "/root/testdata/sf0.01")
      .write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
