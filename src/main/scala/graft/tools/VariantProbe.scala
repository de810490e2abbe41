package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Attribution probe for the VariantType mutation cost (VERDICT r6 task
  * 4): hoist_variant/drop_variant run ~8× their Jackson JSON-string twins.
  * Times the pipeline stages in isolation to find whether the
  * map<string,variant> cast, the inner parse_json(to_json(...)) cycle, or
  * the final serialization dominates.
  *
  * {{{ sbt 'runMain graft.tools.VariantProbe /root/testdata/sf0.1 4' }}}
  */
object VariantProbe {
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

    def events: DataFrame = graft.sources.Tables.events(spark, sfDir)
    // same input shape as hoist_variant
    def jsonIn: Column = to_json(struct(
      col("event_id").as("id"), col("event_type").as("t"),
      col("user_id").as("u")))
    def vIn: Column = parse_json(jsonIn)
    def entries(v: Column): Column = variant_get(v, "$", "map<string, variant>")

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "0_baseline_build_json_only" -> (() =>
        events.select(col("event_id"), jsonIn.as("out"))),
      "1_parse_only" -> (() =>
        events.select(col("event_id"), is_variant_null(vIn).as("out"))),
      "2_parse_plus_entries_cast" -> (() =>
        events.select(col("event_id"), size(map_keys(entries(vIn))).as("out"))),
      "3_parse_entries_tojson" -> (() =>
        events.select(col("event_id"), to_json(entries(vIn)).as("out"))),
      "4_current_hoistJson" -> (() =>
        events.select(col("event_id"),
          graft.transforms.VariantOps.hoistJson(vIn, "wrapped", Seq("id")).as("out"))),
      "5_hoist_no_inner_cycle" -> (() => {
        // skip parse_json(to_json(moved)) AND the final rebuilt-map
        // to_json: serialize kept and moved separately, splice the text
        val m = entries(vIn)
        val kept = map_filter(m, (k, _) => k.isin("id"))
        val moved = map_filter(m, (k, _) => !k.isin("id"))
        val keptJson = to_json(kept)
        val out = when(size(moved) === 0, keptJson).otherwise(concat(
          when(size(kept) > 0,
            concat(substring_index(keptJson, "}", 1), lit(",")))
            .otherwise(lit("{")),
          lit("\"wrapped\":"), to_json(moved), lit("}")))
        events.select(col("event_id"), out.as("out"))
      }),
      "6_current_dropJson_nested" -> (() =>
        events.select(col("event_id"),
          graft.transforms.VariantOps.dropFieldJson(
            parse_json(to_json(struct(col("event_id").as("k"),
              struct(col("event_type").as("t"), col("user_id").as("u")).as("meta")))),
            Seq("meta", "t")).as("out"))),
      "7_jackson_twin_hoist" -> (() =>
        events.select(col("event_id"),
          graft.functions.JsonHoistField(jsonIn, "wrapped", Seq("id")).as("out"))))

    (1 to reps).foreach { i =>
      variants.foreach { case (name, mk) =>
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        println(f"[probe] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
