package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Everything here is designed around ONE principle for 100 TB inputs:
  * never materialize all-pairs. Exact dedup is a single hash-shuffle on a
  * digest; near-dup goes shingle → MinHash signature → LSH band buckets →
  * bucket-local candidate pairs → exact-Jaccard verification. Candidate
  * generation touches only rows that collide in a band, and pathological
  * buckets are capped ([[maxBucketDefault]]) so one hot bucket cannot
  * produce O(n²) pairs on a skewed corpus.
  */
object Dedup {

  /** Default cap on LSH bucket size before a bucket is dropped (skew
    * guard): a bucket of b docs yields b(b-1)/2 pairs, so 64 caps the
    * per-bucket cost at ~2k pairs regardless of corpus skew.
    */
  val maxBucketDefault = 64

  // ---------------------------------------------------------------- exact

  /** Exact dedup: keep, per duplicate group, the row with the smallest
    * `orderCol`. One shuffle, on `md5(key)` — at 100 TB you shuffle a
    * 16-byte digest + the row, never compare texts pairwise. Window +
    * row_number (not groupBy+join-back) keeps it to a single exchange.
    */
  def exact(df: DataFrame, keyCols: Seq[String], orderCol: String): DataFrame = {
    // null-safe composite key: to_json keeps field names and omits
    // nulls, so (a="x", b=NULL) and (a=NULL, b="x") encode differently
    // (a separator-joined concat would collide them and drop NULL parts)
    val key = md5(to_json(struct(keyCols.map(col): _*)))
    val w = Window.partitionBy(key).orderBy(col(orderCol))
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }

  /** Per-group digest summary (the SQL-oracle-able face of exact dedup):
    * one row per distinct key with the surviving id and multiplicity.
    */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  // -------------------------------------------------------------- minhash

  /** Whitespace-collapsed, lower-cased text — the normalization every
    * text operator shares (and the DuckDB oracles replicate verbatim).
    */
  def normText(c: Column): Column = lower(regexp_replace(trim(c), "\\s+", " "))

  /** Distinct word n-gram shingles. Documents shorter than `n` tokens
    * contribute their whole text as a single shingle.
    */
  def shingles(c: Column, n: Int): Column = {
    val toks = split(normText(c), " ")
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
        .otherwise(array(concat_ws(" ", toks))))
  }

  /** (id, shingle) exploded rows — the input shape for signature
    * aggregation. Formulated as posexplode(tokens) + window `lead` rather
    * than array higher-order functions: `transform`/`slice` do NOT
    * participate in whole-stage codegen and evaluate interpreted (measured
    * ~10× slower), while generate → window → project → hash-aggregate is
    * fully codegen'd, and the window's doc-id partitioning is reused by
    * the downstream groupBy (one shuffle total).
    *
    * Documents shorter than `shingleSize` tokens contribute their whole
    * text as a single shingle (same semantics as [[shingles]]).
    */
  def explodedShingles(df: DataFrame, idCol: String, textCol: String,
                       shingleSize: Int): DataFrame = {
    // Explicit fixed-width repartition: this stage is CPU-bound (hashing
    // per shingle), and AQE would otherwise coalesce the tiny-by-bytes
    // shuffle to one partition, serializing it. A fixed numPartitions is
    // exempt from AQE coalescing; the same hash partitioning is then
    // reused by the window AND the downstream signature groupBy (one
    // exchange total). On a cluster this is cores-sized, exactly as a
    // CPU-bound stage should be.
    val p = df.sparkSession.sparkContext.defaultParallelism
    val toks = split(normText(col(textCol)), " ")
    val posTok = df.repartition(p, col(idCol))
      .select(col(idCol), size(toks).as("__n"),
        posexplode(toks).as(Seq("__pos", "__t")))
    if (shingleSize == 1) posTok.select(col(idCol), col("__t").as("__sh"))
    else {
      val w = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
      val leads = (1 until shingleSize).map(j => lead(col("__t"), j).over(w))
      posTok
        .withColumn("__sh", concat_ws(" ", (col("__t") +: leads): _*))
        .withColumn("__last", leads.last) // window exprs can't sit in filter()
        .filter(col("__last").isNotNull ||
          (col("__n") < shingleSize && col("__pos") === 0))
        .select(col(idCol), col("__sh"))
    }
  }

  /** doc → MinHash signature (array of `numHashes` longs), one codegen'd
    * aggregate over exploded shingles. Engine flavor: seeded `xxhash64`.
    */
  def minhashSignature(df: DataFrame, idCol: String, textCol: String,
                       shingleSize: Int = 3, numHashes: Int = 16): DataFrame =
    explodedShingles(df, idCol, textCol, shingleSize)
      .groupBy(col(idCol))
      .agg(array((0 until numHashes).map(s => min(xxhash64(lit(s), col("__sh")))): _*).as("sig"))

  /** Portable signature flavor: lexicographic min of the first 16 hex
    * chars of `md5(seed:shingle)` — bit-identical in any engine with md5;
    * this is what the DuckDB correctness oracle reproduces.
    */
  def minhashSignatureMd5(df: DataFrame, idCol: String, textCol: String,
                          shingleSize: Int = 3, numHashes: Int = 8): DataFrame = {
    val aggs = (0 until numHashes).map(s =>
      min(substring(md5(concat(lit(s + ":"), col("__sh"))), 1, 16)).as(s"mh$s"))
    explodedShingles(df, idCol, textCol, shingleSize)
      .groupBy(col(idCol))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** All unordered pairs (a<b by sort order) of an array column, as
    * structs {a, b}. Works for any orderable element type (ids, structs);
    * shared by the minhash, simhash, and embedding near-dup pipelines.
    */
  def sortedPairs(xs: Column): Column = {
    val sorted = array_sort(xs)
    flatten(transform(sequence(lit(0), size(sorted) - 2), i =>
      transform(slice(sorted, i + lit(2), size(sorted)), b =>
        struct(element_at(sorted, i + lit(1)).as("a"), b.as("b")))))
  }

  /** Exact Jaccard between two docs' shingle sets (verification step —
    * only ever run on LSH candidate pairs, never all pairs).
    */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b)).cast("double")

  /** Full near-dup pipeline: signature → banded candidates → exact-Jaccard
    * verify. Returns (id_a, id_b, jaccard) for pairs ≥ threshold.
    */
  def minhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                          shingleSize: Int = 3, numHashes: Int = 16, bands: Int = 4,
                          threshold: Double = 0.6,
                          maxBucket: Int = maxBucketDefault): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val r = numHashes / bands
    // one codegen'd aggregate produces signature AND shingle set per doc;
    // persisted because three downstream branches reference it (banding +
    // both candidate join-backs) and Catalyst does not CSE subplans — the
    // materialized form is small (per doc: one row of hashes + shingle
    // set), disk-spillable, and at cluster scale this is the table you
    // would checkpoint anyway.
    val base = explodedShingles(df.select(col(idCol).as("__id"), col(textCol)),
      "__id", textCol, shingleSize)
      .groupBy(col("__id"))
      .agg(
        array((0 until numHashes).map(s => min(xxhash64(lit(s), col("__sh")))): _*).as("sig"),
        collect_set(col("__sh")).as("__shset"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = base.select(col("__id"), posexplode(
      transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(b, concat_ws(",", slice(col("sig"), b * r + 1, lit(r)).cast("array<string>")))))
      .as(Seq("band", "bh")))
    val bucketed = banded
      .groupBy("band", "bh").agg(collect_list(col("__id")).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= maxBucket)
    val cand = bucketed
      .select(explode(sortedPairs(col("ids"))).as("p"))
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"))
      .distinct()
    val a = base.select(col("__id").as("id_a"), col("__shset").as("sh_a"))
    val b = base.select(col("__id").as("id_b"), col("__shset").as("sh_b"))
    cand.join(a, "id_a").join(b, "id_b")
      .select(col("id_a"), col("id_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // -------------------------------------------------------------- simhash

  /** 64-bit SimHash over word tokens. Explode + groupBy keeps it one
    * shuffle with map-side partial aggregation (each of the 64 bit-votes
    * is a plain SUM) — scales linearly in corpus size.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol),
      explode(split(normText(col(textCol)), " ")).as("__t"))
      .withColumn("__h", xxhash64(col("__t")))
    val votes = (0 until 64).map { j =>
      sum(when(shiftright(col("__h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$j")
    }
    val agg = tok.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
    val bits = (0 until 64).map { j =>
      when(col(s"v$j") > 0, lit(1L) * pow2(j)).otherwise(0L)
    }
    agg.select(col(idCol), bits.reduce(_ + _).as("simhash"))
  }

  private def pow2(j: Int): Column = lit(if (j == 63) Long.MinValue else 1L << j)

  /** SimHash near-dup candidates: docs within `maxHamming` bits. Blocking
    * on 16-bit chunks (a pair within Hamming distance 3 must agree on at
    * least one of 4 chunks) — bucket-join, never all-pairs.
    */
  def simhashNearDupPairs(sim: DataFrame, idCol: String,
                          maxHamming: Int = 3,
                          maxBucket: Int = maxBucketDefault): DataFrame = {
    val chunks = sim.select(col(idCol), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftrightunsigned(col("simhash"), c * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("chunk", "cv")))
    val bucketed = chunks.groupBy("chunk", "cv")
      .agg(collect_list(struct(col(idCol).as("id"), col("simhash").as("sh"))).as("xs"))
      .filter(size(col("xs")) > 1 && size(col("xs")) <= maxBucket)
    val pairs = bucketed.select(explode(sortedPairs(col("xs"))).as("p"))
      .select(col("p.a.id").as("id_a"), col("p.b.id").as("id_b"),
        col("p.a.sh").as("sh_a"), col("p.b.sh").as("sh_b"))
      .distinct()
    pairs
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

}
