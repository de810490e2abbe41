package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{EntityResolution, Phonetic}

/** Measures entity-resolution BLOCKING at name-universe scales the
  * fixture cannot reach (q_er_scored's 240 names are SF-invariant by
  * construction; a real corpus has 10⁵+ distinct names): synthesizes
  * n names with the phoneticNames mutation structure over an n/3
  * entity space (base `nm` + 5 letters of the entity id, mutation ∈
  * {identity, doubled char at p, 'ey' tail}), then measures the two
  * blocking channels' volumes and the end-to-end candidatePairs cost:
  *
  *   - phonetic bucket histogram (max/p99/avg bucket size): the
  *     phonetic pass is bucket-quadratic, so this is where a scale
  *     cliff would live;
  *   - candidate pair count and wall seconds for the full two-pass
  *     [[EntityResolution.candidatePairs]].
  *
  * Deterministic (name synthesis is pure id arithmetic); times vary
  * per host, counts re-derive exactly.
  */
object ErScaleProbe {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println(f"${"shape"}%8s ${"n_names"}%8s ${"n_entities"}%10s " +
      f"${"del_keys"}%9s ${"max_bucket"}%10s ${"p99_bucket"}%10s " +
      f"${"avg_bucket"}%10s ${"n_pairs"}%10s ${"secs"}%8s")

    for (n <- Seq(10000L, 100000L); shape <- Seq("dense", "diverse")) {
      val ents = n / 3
      val e = col("id") % ents
      // dense: a 10-letter alphabet over near-identical structure — the
      // self-similar worst case (true pair count itself grows fast).
      // diverse: base-26 entity letters — the realistic regime where
      // sound classes and segments actually discriminate.
      val b =
        if (shape == "dense") concat(lit("nm"),
          translate(lpad(e.cast("string"), 5, "0"),
            "0123456789", "abcdefghij"))
        else concat(lit("nm"),
          expr(s"char(97 + (id % $ents) div 17576 % 26)"),
          expr(s"char(97 + (id % $ents) div 676 % 26)"),
          expr(s"char(97 + (id % $ents) div 26 % 26)"),
          expr(s"char(97 + (id % $ents) % 26)"))
      val names = spark.range(0, n)
        .select(col("id"),
          b.as("b"),
          (lit(1) + col("id") % 4).cast("int").as("p"),
          (col("id") % 3).cast("int").as("m"))
        .select(
          when(col("m") === 0, col("b"))
            .when(col("m") === 1,
              concat(expr("substring(b, 1, p)"), expr("substring(b, p)")))
            .otherwise(concat(col("b"), lit("ey"))).as("name"))
        .distinct()
      val nNames = names.count()
      // the fuzzy channel's blocking volume: a d=1 deletion neighborhood
      // emits len+1 keys per distinct string (the string + each
      // single-deletion variant)
      val nDelKeys = names.agg(sum(length(col("name")) + 1)).head().getLong(0)
      val buckets = names.select(Phonetic.key(col("name")).as("k"))
        .groupBy("k").count().select(col("count").as("c"))
      val stats = buckets.agg(
        max(col("c")).as("mx"),
        expr("percentile(c, 0.99)").as("p99"),
        avg(col("c")).as("av")).head()
      val t0 = System.nanoTime()
      val nPairs = EntityResolution.candidatePairs(names, "name",
        maxEdit = 1, maxPhoneticDist = 2).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"$shape%8s $nNames%8d $ents%10d $nDelKeys%9d " +
        f"${stats.getLong(0)}%10d ${stats.getDouble(1)}%10.1f " +
        f"${stats.getDouble(2)}%10.1f $nPairs%10d $secs%8.2f")
    }
    spark.stop()
  }
}
