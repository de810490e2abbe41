package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Merge

/** Measures the design claim behind [[Merge.applyChanges]] (r11): under
  * CDC hot-key skew — one row updated k times in a batch, the classic
  * change-log pathology — the map-side-combinable `max_by` compaction
  * ships one partial row per map partition, while the textbook
  * `row_number() OVER (PARTITION BY key ORDER BY prec DESC, seq DESC)`
  * formulation materializes the hot key's entire change history in one
  * window task. Same inputs, same output (asserted), warm min of `reps`.
  *
  * The change batch: `hotShare` of all change rows target ONE key,
  * the rest spread uniformly over the snapshot's key space.
  *
  * Usage: {{{ sbt 'runMain graft.tools.MergeSkewProbe [nSnap] [nChanges] [reps]' }}}
  */
object MergeSkewProbe {
  def main(args: Array[String]): Unit = {
    val nSnap = args.headOption.map(_.toInt).getOrElse(1000000)
    val nChanges = args.lift(1).map(_.toInt).getOrElse(4000000)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val snap = spark.range(nSnap.toLong)
      .select(col("id"), (col("id") % 97).as("v")).cache()
    snap.count()
    // half the change rows hammer key 0; seq = the source range index,
    // globally unique, so latest-wins is total on every key
    val changes = spark.range(nChanges.toLong)
      .select(
        when(col("id") % 2 === 0, lit(0L))
          .otherwise(col("id") % nSnap).as("id"),
        (col("id") + 1000L).as("v"),
        col("id").as("seq"),
        lit("u").as("op"))
      .cache()
    changes.count()

    def windowMerge() = {
      val tagged = snap
        .withColumn("_prec", lit(0)).withColumn("_seq", lit(Long.MinValue))
        .withColumn("_op", lit("u"))
        .unionByName(changes.select(col("id"), col("v"),
          lit(1).as("_prec"), col("seq").as("_seq"), col("op").as("_op")))
      val w = Window.partitionBy("id")
        .orderBy(col("_prec").desc, col("_seq").desc)
      tagged.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1 && col("_op") =!= "d")
        .select("id", "v")
    }

    def time(label: String, run: () => Long): Unit = {
      run()
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = run()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[mergeskew] $label%-10s warm_min=${ts.map(_._1).min}%6.2f s " +
        f"rows=${ts.head._2}%d")
    }

    println(s"[mergeskew] snapshot=$nSnap changes=$nChanges " +
      s"(~${nChanges / 2} on ONE key) cpus=$cpus")
    time("max_by", () =>
      Merge.applyChanges(snap, changes, Seq("id"), "seq", "op").count())
    time("window", () => windowMerge().count())
    val a = Merge.applyChanges(snap, changes, Seq("id"), "seq", "op")
      .agg(sum(col("v")), count(lit(1))).head()
    val b = windowMerge().agg(sum(col("v")), count(lit(1))).head()
    println(s"[mergeskew] agreement: max_by=$a window=$b " +
      (if (a == b) "IDENTICAL" else "MISMATCH"))
    // is the window formulation being rescued by Spark 4's
    // WindowGroupLimit partial pushdown (the rn=1 map-side top-1)?
    val wPlan = { val df = windowMerge(); df.count(); df.queryExecution.executedPlan.toString }
    println(s"[mergeskew] window plan WindowGroupLimit(Partial): " +
      wPlan.contains("WindowGroupLimit") + "/" + wPlan.contains("Partial"))
    spark.stop()
  }
}
