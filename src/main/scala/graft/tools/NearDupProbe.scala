package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Components, Dedup, Similarity}

/** Unified near-dup recall/cost harness: plant a LABELED corpus (10% of
  * docs get a truncated near twin at id + 10M), run all four text
  * near-dup methods over the SAME corpus, and report recall over the
  * planted pairs, total emitted pairs, and warm wall time per method —
  * the engineering table that turns "which dedup method?" into a
  * documented trade (SURVEY §2.4).
  *
  * The four methods, each at its driver-query configuration:
  *  - minhash: [[Dedup.minhashNearDupPairs]] (16 lanes, 4 bands,
  *    jaccard >= 0.6 verify) — the banded-LSH pipeline;
  *  - simhash: [[Dedup.simhash]] → [[Dedup.simhashNearDupPairs]]
  *    (64-bit vote hash, 16-bit chunk blocking, Hamming <= 3);
  *  - winnow: [[Dedup.winnowOverlapPairs]] (k=4, w=5, >= 2 shared
  *    fingerprints) — the MOSS overlap detector;
  *  - embedding: feature-hashed 64-dim bag-of-words vector →
  *    [[Similarity.cosineNearDupPairs]] (cosine >= 0.95, sign-bucket
  *    blocking) — the semantic-similarity path on a deterministic
  *    text-derived embedding, so all four methods see identical input.
  *
  * A dropped-last-word twin is the planted label because every method
  *  should catch it (high token overlap, tiny Hamming drift, shared
  * winnow runs, near-parallel count vectors) — recall below 100% is the
  * method's blocking/threshold loss, directly comparable across methods.
  *
  * Two recall columns per method:
  *  - PAIR recall: the planted (a, b) pair is literally emitted;
  *  - CC recall: a and b land in the same connected component of the
  *    emitted pair graph ([[Components.connectedComponents]]) — the
  *    metric the capped designs actually contract for. Hot buckets emit
  *    CHAIN pairs (linear, connectivity-preserving) instead of all
  *    pairs, so in a duplicate-saturated corpus a planted twin is often
  *    reachable through clique neighbors without its literal pair ever
  *    being enumerated. Every downstream consumer here (q_dedup_groups,
  *    dedup_e2e, q_leakage_split) consumes COMPONENTS, not raw pairs.
  *
  * Usage: {{{ sbt 'runMain graft.tools.NearDupProbe /root/testdata/sf0.1 [reps] [tiles] [saturated]' }}}
  * Warm wall time = min of `reps` (default 2) timed materializations
  * after an untimed warmup rep; caches cleared between reps, as in
  * Bench. `tiles` (default 1) scales the corpus IN the probe: each doc
  * is replicated `tiles` times at id + k·10⁷ with every token SALTED by
  * the tile index (token → token<k>), so tiles of the same doc share no
  * shingles — the corpus grows 100× in genuinely DISTINCT documents and
  * the planted twins stay the only near-dup signal (clean labels: recall
  * measures the METHOD at scale, with bucket/band collision rates of a
  * real diverse corpus). Passing `saturated` as the 4th arg switches to
  * a FRONT-salt (`t<k> <text>`): tiles stay textually distinct but
  * remain mutual near-dups (~100-cliques — one changed token out of
  * ~dozens), modeling a duplicate-saturated crawl where the cap
  * machinery dominates: pair recall collapses BY DESIGN while CC recall
  * is what survives. (The shared /tmp/sf01_x100 corpus is unusable for
  * labels either way: exact-copy tiled, and its id space collides with
  * the twin offsets.) Twins live at id + 10¹⁰, above any tiled id.
  */
object NearDupProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val tiles = args.lift(2).map(_.toInt).getOrElse(1)
    val saturated = args.lift(3).contains("saturated")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val raw = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val base =
      if (tiles == 1) raw
      else {
        val tiled = raw.select(col("doc_id"), col("text"),
          explode(sequence(lit(0), lit(tiles - 1))).as("__k"))
        val salted =
          if (saturated)
            // front salt only: tiles stay mutual near-dups (~tiles-cliques)
            concat(lit("t"), col("__k"), lit(" "), col("text"))
          else
            // per-token salt: tiles of one doc share NO shingles — the
            // scaled corpus is genuinely distinct documents
            array_join(
              transform(split(Dedup.normText(col("text")), " "),
                t => concat(t, col("__k"))), " ")
        tiled.select((col("doc_id") + col("__k") * 10000000L).as("doc_id"),
          salted.as("text"))
      }
    val twinOff = 10000000000L // above any tiled id
    val twins = base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + twinOff).as("doc_id"),
        regexp_replace(col("text"), "\\s+\\S+$", "").as("text"))
    val corpus = base.union(twins)
    val planted = base.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id").as("id_a"), (col("doc_id") + twinOff).as("id_b"))
      .persist()
    val nPlanted = planted.count()
    val mode = if (tiles == 1) "raw" else if (saturated) "saturated" else "distinct"
    println(s"[neardup] corpus=$dir tiles=$tiles mode=$mode planted=$nPlanted twin pairs")

    // 64-dim feature-hashed bag-of-words — deterministic, text-derived,
    // one exploded pass + one map-side-combined aggregate
    def hashedEmbedding(df: DataFrame): DataFrame = {
      val d = df.select(col("doc_id"),
        explode(split(Dedup.normText(col("text")), " ")).as("__t"))
        .select(col("doc_id"), pmod(xxhash64(col("__t")), lit(64)).as("__d"))
      val sums = (0 until 64).map(i =>
        sum(when(col("__d") === i, 1L).otherwise(0L)).as(s"__c$i"))
      d.groupBy(col("doc_id")).agg(sums.head, sums.tail: _*)
        .select(col("doc_id"),
          array((0 until 64).map(i => col(s"__c$i").cast("float")): _*).as("emb"))
    }

    val methods: Seq[(String, () => DataFrame)] = Seq(
      "minhash" -> (() =>
        Dedup.minhashNearDupPairs(corpus, "doc_id", "text")
          .select(col("id_a"), col("id_b"))),
      "simhash" -> (() => {
        // persisted as in dedup_simhash_pairs (the chunk self-join reads
        // the signature subtree twice); the probe's clearCache between
        // reps releases it
        val sim = Dedup.simhash(corpus, "doc_id", "text")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        Dedup.simhashNearDupPairs(sim, "doc_id", maxHamming = 3)
          .select(col("id_a"), col("id_b"))
      }),
      "winnow" -> (() =>
        Dedup.winnowOverlapPairs(corpus, "doc_id", "text")
          .select(col("id_a"), col("id_b"))),
      "embedding" -> (() =>
        Similarity.cosineNearDupPairs(hashedEmbedding(corpus), "doc_id", "emb",
          minCosine = 0.95)
          .select(col("id_a"), col("id_b"))),
      // the band-OR recall knob measured: T independent plane sets give a
      // near-dup pair T chances to share a sign bucket (recall
      // 1-(1-p)^T) at T x candidate cost — the single-table row above
      // shows why the knob exists
      "embedding_t4" -> (() =>
        Similarity.cosineNearDupPairs(hashedEmbedding(corpus), "doc_id", "emb",
          minCosine = 0.95, numTables = 4)
          .select(col("id_a"), col("id_b"))))

    val rows = methods.map { case (name, build) =>
      // untimed warmup, then `reps` timed materializations, min reported
      spark.catalog.clearCache()
      build().write.mode("overwrite").format("noop").save()
      val times = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        build().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      spark.catalog.clearCache()
      val pairs = build().persist()
      val total = pairs.count()
      // planted ids are offset by 10¹⁰, so orientation is fixed: a < b
      val hit = pairs.join(planted, Seq("id_a", "id_b")).count()
      // CC recall: same component of the emitted pair graph — what the
      // chain-capped designs contract for (untimed; measurement only)
      val comps = Components.connectedComponents(pairs, "id_a", "id_b")
        .persist()
      val ccHit = planted
        .join(comps.select(col("id").as("id_a"), col("component").as("__ca")), "id_a")
        .join(comps.select(col("id").as("id_b"), col("component").as("__cb")), "id_b")
        .filter(col("__ca") === col("__cb")).count()
      comps.unpersist()
      pairs.unpersist()
      val recall = 100.0 * hit / math.max(nPlanted, 1L)
      val ccRecall = 100.0 * ccHit / math.max(nPlanted, 1L)
      println(f"[neardup] $name%-10s pair-recall=$recall%6.2f%% ($hit%d/$nPlanted%d) " +
        f"cc-recall=$ccRecall%6.2f%% pairs=$total%8d warm=${times.min}%7.2f s")
      (name, recall, ccRecall, total, times.min)
    }
    println("[neardup] | method | pair recall | cc recall | total pairs | warm s |")
    rows.foreach { case (n, r, c, t, w) =>
      println(f"[neardup] | $n | $r%.2f%% | $c%.2f%% | $t | $w%.2f |")
    }
    spark.stop()
  }
}
