package graft.operators

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`ARRAY<FLOAT>`).
  *
  * Two tiers, per the scale plan:
  *  - [[bruteForceTopK]] — exact cosine top-k via a broadcast nested-loop
  *    join: the QUERY side is broadcast (it is small by definition), the
  *    corpus side streams. Exact, and the right baseline at any scale
  *    where queries ≪ corpus; cost is O(|Q|·|corpus|·dim) FLOPs with no
  *    shuffle of the corpus at all.
  *  - [[lshTopK]] — random-hyperplane LSH: corpus and queries hash to
  *    sign-bit buckets, candidates are bucket-colocated rows only, then
  *    exact cosine re-rank inside the bucket. Sub-linear candidate sets;
  *    the recall/cost trade is `numPlanes` (more planes → smaller buckets
  *    → faster, lower recall). This is the 100 TB path: bucket ids shuffle,
  *    vectors stay partition-local until the final candidate join.
  *
  * All arithmetic is double-precision and sequential (`aggregate` over
  * `zip_with`), keeping results deterministic and engine-comparable.
  */
object Similarity {

  /** Sequential double-precision dot product of two float-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for each query vector.
    *
    * @param corpus  (idCol, vecCol) big side — never shuffled before ranking
    * @param queries (idCol, vecCol) small side — broadcast
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val scored = c.crossJoin(q)
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv")).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic random hyperplanes (driver-side, tiny, broadcast as a
    * literal into the plan).
    */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit bucket id of a vector under the given hyperplanes. */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(vec, typedlit(p.toSeq)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Embedding-cosine near-duplicate pairs: rows whose vectors are closer
    * than `minCosine`. Candidates come from LSH sign-buckets (plus no
    * corpus self-shuffle tricks): two near-identical vectors agree on
    * every hyperplane sign with high probability, so bucket-equality
    * blocking finds them without an all-pairs cross join. `numPlanes`
    * trades recall for bucket size; pathological buckets are capped.
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         minCosine: Double = 0.95, numPlanes: Int = 8,
                         seed: Long = 42L, maxBucket: Int = 256,
                         numTables: Int = 1): DataFrame = {
    val dim = 64
    // band-OR: each extra hash table (independent plane set) gives a
    // near-dup pair another chance to collide — recall 1-(1-p)^T for
    // per-table collision probability p, at T× candidate cost.
    val allPlanes = (0 until numTables).map(t => hyperplanes(numPlanes, dim, seed + t))
    val withBucket = df.select(col(idCol), col(vecCol).as("__v"),
      posexplode(array(allPlanes.map(p => lshBucket(col(vecCol), p)): _*))
        .as(Seq("__table", "__bucket")))
    val bucketed = withBucket
      .groupBy("__table", "__bucket")
      .agg(collect_list(struct(col(idCol).as("id"), col("__v").as("v"))).as("xs"))
      .filter(size(col("xs")) > 1 && size(col("xs")) <= maxBucket)
    val pairs = bucketed
      .select(explode(pairStructsOf(col("xs"))).as("p"))
      .select(col("p.a.id").as("id_a"), col("p.b.id").as("id_b"),
        cosine(col("p.a.v"), col("p.b.v")).as("cosine"))
    pairs.filter(col("cosine") >= minCosine).distinct()
  }

  /** All unordered pairs (a<b by id) of an array of {id, v} structs. */
  private def pairStructsOf(xs: Column): Column = {
    val sorted = array_sort(xs)
    flatten(transform(sequence(lit(0), size(sorted) - 2), i =>
      transform(slice(sorted, i + lit(2), size(sorted)), b =>
        struct(element_at(sorted, i + lit(1)).as("a"), b.as("b")))))
  }

  /** Approximate top-k: candidates = same LSH bucket, exact cosine re-rank
    * within the bucket. Note the single shuffle on the (small) bucket id;
    * with `numPlanes` ≈ log2(corpus/bucketTarget) buckets stay executor-
    * sized at any corpus scale.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              numPlanes: Int = 8, seed: Long = 42L): DataFrame = {
    val dim = 64
    val planes = hyperplanes(numPlanes, dim, seed)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      lshBucket(col(vecCol), planes).as("__bucket"))
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      lshBucket(col(vecCol), planes).as("__bucket")))
    val scored = c.join(q, "__bucket")
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv")).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
