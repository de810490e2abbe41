package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Attribution probe for the dedup_minhash_pairs vs dedup_pairs_md5 bench
  * gap (VERDICT r6 task 2): times stage variants of the engine xxhash64
  * pipeline back-to-back in one JVM so the cost of each structural
  * difference — 16 vs 8 lanes, the bucket-cap window stage, string-cast vs
  * native array banding — is measured, not guessed.
  *
  * {{{ sbt 'runMain graft.tools.MinhashFlavorProbe /root/testdata/sf0.1 4' }}}
  */
object MinhashFlavorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def planted(): DataFrame = {
      val d = graft.sources.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"))
      d.union(d.filter(col("doc_id") < 20).select(
        (col("doc_id") + 100000).as("doc_id"),
        regexp_replace(col("text"), "\\s+\\S+$", "").as("text")))
    }

    // ---- variant pieces (copies of Dedup internals, parameterized) ----
    def base(numHashes: Int): DataFrame = {
      val lanes: Seq[Column] = {
        val h1 = xxhash64(col("__sh"))
        val h2 = xxhash64(lit(1), col("__sh"))
        (0 until numHashes).map {
          case 0 => h1
          case i => h1.bitwiseXOR(
            shiftleft(h2, i).bitwiseOR(shiftrightunsigned(h2, 64 - i)))
        }
      }
      graft.operators.Dedup.explodedShingles(
        planted().select(col("doc_id").as("__id"), col("text")), "__id", "text", 3)
        .groupBy(col("__id"))
        .agg(array(lanes.map(min): _*).as("sig"),
          collect_set(xxhash64(col("__sh"))).as("__shset"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

    def bandedStr(b: DataFrame, bands: Int, r: Int): DataFrame =
      b.select(col("__id"),
        xxhash64(concat_ws(",", col("sig").cast("array<string>"))).as("__sk"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          i => xxhash64(i, concat_ws(",", slice(col("sig"), i * r + 1, lit(r)).cast("array<string>")))))
          .as(Seq("band", "bh")))

    def bandedArr(b: DataFrame, bands: Int, r: Int): DataFrame =
      b.select(col("__id"),
        xxhash64(col("sig")).as("__sk"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          i => xxhash64(i, slice(col("sig"), i * r + 1, lit(r)))))
          .as(Seq("band", "bh")))

    def capped(banded: DataFrame, maxBucket: Int,
               doPersist: Boolean = true): DataFrame = {
      val w = Window.partitionBy("band", "bh")
      val withStats0 = banded.withColumn("__cnt", count(lit(1)).over(w))
      val withStats = if (doPersist)
        withStats0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else withStats0
      val smallIds = withStats
        .filter(col("__cnt") > 1 && col("__cnt") <= maxBucket)
        .select(col("band"), col("bh"), col("__id"))
      val smallPairs = smallIds.as("x").join(smallIds.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.__id") < col("y.__id"))
        .select(col("x.__id").as("id_a"), col("y.__id").as("id_b"))
      val wOrd = Window.partitionBy("band", "bh").orderBy(col("__sk"), col("__id"))
      val chainPairs = withStats
        .filter(col("__cnt") > maxBucket)
        .withColumn("__next", lead(col("__id"), 1).over(wOrd))
        .filter(col("__next").isNotNull)
        .select(least(col("__id"), col("__next")).as("id_a"),
          greatest(col("__id"), col("__next")).as("id_b"))
      smallPairs.union(chainPairs).distinct()
    }

    // hot-bucket handling via key joins instead of a full-table window:
    // bucket sizes come from a map-side-combined groupBy (tiny shuffle),
    // only OVERSIZED bucket keys join back (anti → all-pairs branch,
    // semi → chain branch). AQE broadcasts the hot set when tiny (the
    // healthy-corpus case) and degrades to a shuffle join when not.
    def cappedHotKeys(banded: DataFrame, maxBucket: Int): DataFrame = {
      val hot = banded.groupBy(col("band"), col("bh"))
        .agg(count(lit(1)).as("__cnt")).filter(col("__cnt") > maxBucket)
        .select(col("band"), col("bh"))
      val small = banded.join(hot, Seq("band", "bh"), "left_anti")
        .select(col("band"), col("bh"), col("__id"))
      val smallPairs = small.as("x").join(small.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.__id") < col("y.__id"))
        .select(col("x.__id").as("id_a"), col("y.__id").as("id_b"))
      val wOrd = Window.partitionBy("band", "bh").orderBy(col("__sk"), col("__id"))
      val chainPairs = banded.join(hot, Seq("band", "bh"), "left_semi")
        .withColumn("__next", lead(col("__id"), 1).over(wOrd))
        .filter(col("__next").isNotNull)
        .select(least(col("__id"), col("__next")).as("id_a"),
          greatest(col("__id"), col("__next")).as("id_b"))
      smallPairs.union(chainPairs).distinct()
    }

    def uncapped(banded: DataFrame): DataFrame =
      banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.__id") < col("y.__id"))
        .select(col("x.__id").as("id_a"), col("y.__id").as("id_b"))
        .distinct()

    def verify(cand: DataFrame, b: DataFrame, threshold: Double): DataFrame = {
      val a0 = b.select(col("__id").as("id_a"), col("__shset").as("sh_a"))
      val b0 = b.select(col("__id").as("id_b"), col("__shset").as("sh_b"))
      cand.join(a0, "id_a").join(b0, "id_b")
        .select(col("id_a"), col("id_b"),
          (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))).cast("double")).as("jaccard"))
        .filter(col("jaccard") >= threshold)
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "A_current_16L_capped_str" -> (() => {
        val b = base(16); verify(capped(bandedStr(b, 4, 4), 64), b, 0.5) }),
      "B_8lanes_capped_str" -> (() => {
        val b = base(8); verify(capped(bandedStr(b, 4, 2), 64), b, 0.5) }),
      "C_16L_uncapped_str" -> (() => {
        val b = base(16); verify(uncapped(bandedStr(b, 4, 4)), b, 0.5) }),
      "D_16L_capped_arrayhash" -> (() => {
        val b = base(16); verify(capped(bandedArr(b, 4, 4), 64), b, 0.5) }),
      "E_16L_uncapped_arrayhash" -> (() => {
        val b = base(16); verify(uncapped(bandedArr(b, 4, 4)), b, 0.5) }),
      "F_reference_md5_flavor" -> (() =>
        graft.SparkEntry.queries("dedup_pairs_md5")(spark, sfDir)),
      "G_16L_capped_str_nopersist" -> (() => {
        val b = base(16); verify(capped(bandedStr(b, 4, 4), 64, doPersist = false), b, 0.5) }),
      "H_16L_capped_arr_nopersist" -> (() => {
        val b = base(16); verify(capped(bandedArr(b, 4, 4), 64, doPersist = false), b, 0.5) }),
      "I_16L_arr_hotkey_joins" -> (() => {
        val b = base(16); verify(cappedHotKeys(bandedArr(b, 4, 4), 64), b, 0.5) }))

    (1 to reps).foreach { i =>
      variants.foreach { case (name, mk) =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = mk().count()
        println(f"[probe] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n pairs)")
      }
    }
    spark.stop()
  }
}
