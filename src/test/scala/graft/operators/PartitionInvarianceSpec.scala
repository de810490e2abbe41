package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Partition-layout invariance: operators whose scaladocs claim their
  * output is independent of how the input happens to be partitioned
  * (the property that makes results reproducible across cluster sizes,
  * AQE decisions, and file layouts at 100 TB) are pinned here by
  * running each one over the SAME rows under three different incoming
  * layouts and asserting set-identical output.
  */
class PartitionInvarianceSpec extends SparkTestBase {

  private def docs = graft.sources.Tables
    .documents(spark, "/root/testdata/sf0.001")

  private def layouts(df: DataFrame): Seq[DataFrame] =
    Seq(df.coalesce(1), df.repartition(7), df.repartition(17, col("doc_id")))

  private def asSet(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("deterministicSplit assigns identically under any input layout") {
    val got = layouts(docs).map { d =>
      asSet(Sampling.deterministicSplit(d, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("split")))
    }
    assert(got.distinct.size == 1, "split assignment depends on layout")
  }

  test("Dedup.exact keeps the same representatives under any input layout") {
    val got = layouts(docs).map { d =>
      asSet(Dedup.exact(d, Seq("lang"), "doc_id")
        .select(col("doc_id"), col("lang")))
    }
    assert(got.distinct.size == 1, "kept rows depend on layout")
  }

  test("topKPerKey returns the same rows under any input layout") {
    // unique doc_id order column: no ties, so the top-k set is total
    val got = layouts(docs).map { d =>
      asSet(graft.plans.TopKPerKey.topKPerKey(
        d.select(col("doc_id"), col("lang")),
        keyCols = Seq("lang"), orderCols = Seq("doc_id" -> true), k = 5))
    }
    assert(got.distinct.size == 1, "top-k rows depend on layout")
  }
}
