package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SimilaritySpec extends SparkTestBase {

  private def embDf = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val base = Array.fill(16)(rnd.nextGaussian().toFloat)
    def jitter(eps: Float) = base.zipWithIndex.map { case (v, i) =>
      v + (if (i % 3 == 0) eps else 0f)
    }.toSeq
    (Seq(
      0L -> base.toSeq,              // query
      1L -> jitter(0.01f),           // very close
      2L -> jitter(0.3f),            // close-ish
      3L -> base.map(-_).toSeq) ++   // opposite
      (4L until 40L).map(i => i -> Seq.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
  }

  test("brute-force top-k ranks the planted near-neighbor first") {
    val q = embDf.filter(col("vec_id") === 0)
    val got = Similarity.bruteForceTopK(embDf, q, "vec_id", "embedding", 4)
      .orderBy("rank").collect()
    assert(got.head.getAs[Long]("neighbor_id") == 0L, "self is rank 1 (sim 1.0)")
    assert(got(1).getAs[Long]("neighbor_id") == 1L, "planted near-dup is rank 2")
    assert(got.forall(_.getAs[Long]("neighbor_id") != 3L), "opposite vector never in top-4")
    val sims = got.map(_.getAs[Double]("sim"))
    assert(sims.head > 0.9999 && sims.sameElements(sims.sorted.reverse))
  }

  test("LSH top-k: same bucket contains the planted neighbor; recall vs brute force") {
    val q = embDf.filter(col("vec_id") === 0)
    val lsh = Similarity.lshTopK(embDf, q, "vec_id", "embedding", 4, numPlanes = 4)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(lsh.contains(0L) && lsh.contains(1L),
      s"sign-bucket of the query must contain itself and the 0.01-jitter copy, got $lsh")
  }

  test("cosineNearDupPairs finds planted jittered copy, skips unrelated") {
    val pairs = Similarity.cosineNearDupPairs(embDf, "vec_id", "embedding",
      minCosine = 0.98, numPlanes = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), s"0 and its 0.01-jitter must pair, got $pairs")
    assert(!pairs.exists { case (a, b) => Set(a, b) == Set(0L, 3L) },
      "opposite vectors must not pair")
  }

  test("oversized cosine bucket: chain pairs link all planted identical vectors") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val base = Seq.fill(16)(rnd.nextGaussian().toFloat)
    // 8 identical vectors with maxBucket=3: every bucket overflows; the
    // old drop policy would return nothing, the vector-hash-sorted chain
    // must connect all of 0..7 (identical vectors sort adjacent)
    val df = ((0L until 8L).map(i => i -> base) :+
      (99L -> Seq.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.cosineNearDupPairs(df, "vec_id", "embedding",
      minCosine = 0.999, numPlanes = 4, maxBucket = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = pairs.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val seen = scala.collection.mutable.Set(0L)
    val stack = scala.collection.mutable.Stack(0L)
    while (stack.nonEmpty) {
      adj.getOrElse(stack.pop(), Nil).foreach(n => if (seen.add(n)) stack.push(n))
    }
    assert((0L until 8L).forall(seen.contains),
      s"identical vectors must form one component, got $pairs")
  }

  test("int8 quantization round-trip preserves cosine within 1%") {
    val df = embDf.select(col("vec_id"), col("embedding"),
      Similarity.quantizeScale(col("embedding")).as("s"))
      .select(col("vec_id"), col("embedding"),
        Similarity.quantize(col("embedding"), col("s")).as("q"), col("s"))
      .select(col("vec_id"),
        Similarity.cosine(col("embedding"),
          Similarity.dequantize(col("q"), col("s"))).as("c"),
        array_max(transform(col("q"), x => abs(x))).as("qmax"))
    val rows = df.collect()
    assert(rows.forall(_.getDouble(1) > 0.99),
      s"dequantized vectors must stay cosine-close: ${rows.map(_.getDouble(1)).min}")
    assert(rows.forall(_.getInt(2) <= 127), "codes fit int8 range")
  }

  test("quantize handles the all-zero vector") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Seq(0f, 0f, 0f))).toDF("vec_id", "embedding")
      .select(Similarity.quantize(col("embedding"),
        Similarity.quantizeScale(col("embedding"))).as("q"))
    assert(df.head.getSeq[Int](0) == Seq(0, 0, 0))
  }

  test("cosine expression: orthonormal sanity") {
    val s = spark
    import s.implicits._
    val df = Seq((Seq(1f, 0f), Seq(0f, 1f), Seq(2f, 0f)))
      .toDF("a", "b", "c")
    val r = df.select(
      Similarity.cosine(col("a"), col("b")).as("ab"),
      Similarity.cosine(col("a"), col("c")).as("ac")).head()
    assert(math.abs(r.getDouble(0)) < 1e-12)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("IVF top-k: high recall vs brute force at nprobe=nlist/2; planted neighbor found") {
    val q = embDf.filter(col("vec_id") === 0)
    val brute = Similarity.bruteForceTopK(embDf, q, "vec_id", "embedding", 5)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    val ivf = Similarity.ivfTopK(embDf, q, "vec_id", "embedding", 5,
      nlist = 4, nprobe = 2)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(ivf.contains(0L) && ivf.contains(1L),
      s"query cell must contain self and the jittered copy, got $ivf")
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.6, s"recall $recall too low; brute=$brute ivf=$ivf")
  }

  test("IVF centroids are deterministic and cell assignment is exhaustive") {
    val c1 = Similarity.trainIvfCentroids(embDf, "embedding", 4, seed = 9L)
    val c2 = Similarity.trainIvfCentroids(embDf, "embedding", 4, seed = 9L)
    assert(c1.flatten.toSeq == c2.flatten.toSeq)
    val cells = embDf.select(Similarity.ivfCellCol(col("embedding"), c1).as("c"))
      .collect().map(_.getInt(0))
    assert(cells.forall(c => c >= 0 && c < 4))
  }

  test("fixed-quantizer IVF: self+planted found; probing all cells equals brute force") {
    val q = embDf.filter(col("vec_id") === 0)
    val cents = Similarity.fixedCentroids(nlist = 4, dim = 16, seed = 7L)
    val ivf = Similarity.ivfTopKWith(embDf, q, "vec_id", "embedding", 5, cents, nprobe = 2)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(ivf.contains(0L) && ivf.contains(1L),
      s"query cell must contain self and the jittered copy, got $ivf")
    // nprobe = nlist degenerates to exact brute force — same ranked list
    val all = Similarity.ivfTopKWith(embDf, q, "vec_id", "embedding", 5, cents, nprobe = 4)
      .orderBy("rank").collect().map(_.getAs[Long]("neighbor_id")).toSeq
    val brute = Similarity.bruteForceTopK(embDf, q, "vec_id", "embedding", 5)
      .orderBy("rank").collect().map(_.getAs[Long]("neighbor_id")).toSeq
    assert(all == brute, s"nprobe=nlist must equal brute force: $all vs $brute")
    assert(Similarity.fixedCentroids(4, 16, 7L).flatten.toSeq ==
      cents.flatten.toSeq, "fixed centroids are deterministic")
  }

  test("labelCentroidSums matches a local fixed-point reference exactly") {
    val s = spark
    import s.implicits._
    val labeled = embDf.withColumn("label", (col("vec_id") % 3).cast("int"))
    val got = Similarity.labelCentroidSums(labeled, "label", "embedding", scaleBits = 20)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // local reference: same floor(v * 2^20) fixed-point accumulation
    val local = labeled.select("label", "embedding").collect()
      .flatMap { r =>
        val l = r.getInt(0)
        r.getSeq[Float](1).zipWithIndex.map { case (v, d) =>
          (l, d.toLong) -> math.floor(v.toDouble * (1L << 20)).toLong
        }
      }
      .groupBy(_._1).map { case (k, vs) => k -> (vs.length.toLong, vs.map(_._2).sum) }
    assert(got == local)
    assert(got.keys.map(_._1).toSet == Set(0, 1, 2))
    assert(got.keys.count(_._1 == 0) == 16, "one row per (label, dim)")
  }

  test("semDedup flags near-copies within a cluster by the lower-id rule") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    def vec() = Seq.fill(16)(rnd.nextGaussian().toFloat)
    val v0 = vec(); val v1 = vec()
    val df = Seq(
      0L -> v0,
      1L -> v0.map(x => x + 0.0001f), // near-copy of 0 → flagged
      2L -> v1,                        // distinct → clean
      3L -> v0.map(x => x + 0.0002f)  // near-copy of 0 → flagged too
    ).toDF("id", "v")
    val cents = Similarity.fixedCentroids(nlist = 4, dim = 16, seed = 7L)
    val out = Similarity.semDedup(df, "id", "v", cents, threshold = 0.999)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out == Map(0L -> false, 1L -> true, 2L -> false, 3L -> true))
    // cluster assignment must agree with the IVF cell column (shared code)
    val cells = df.select(col("id"),
      Similarity.ivfCellCol(col("v"), cents).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val clusters = Similarity.semDedup(df, "id", "v", cents, 0.999)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(clusters == cells)
  }

  test("semDedup overflow: hot clusters degrade to representative comparison") {
    val s = spark
    import s.implicits._
    // four vectors in one direction (one cell): 1 is a near-copy of 0
    // (the min-id representative), 2 is a distinct doc in the same cell,
    // 3 is a near-copy of 2 (NOT of the representative)
    val v0 = Seq(1f, 0f, 0f, 0f)
    val v1 = v0.map(_ * 0.99f)
    val v2 = Seq(0.9f, 0.1f, 0f, 0f)
    val v3 = v2.map(_ * 0.99f)
    val df = Seq(0L -> v0, 1L -> v1, 2L -> v2, 3L -> v3).toDF("id", "v")
    // explicit quantizer: every test vector is nearest the first centroid
    val cents = Array(Array(1.0, 0, 0, 0), Array(-1.0, 0, 0, 0),
      Array(0, -1.0, 0, 0), Array(0, 0, -1.0, 0))
    val cells = df.select(Similarity.ivfCellCol(col("v"), cents))
      .collect().map(_.getInt(0)).toSet
    assert(cells == Set(0), s"test precondition: one shared cell, got $cells")
    def flags(maxCluster: Int) =
      Similarity.semDedup(df, "id", "v", cents, threshold = 0.999,
        maxCluster = maxCluster)
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    // full pairwise: both near-copies flagged
    assert(flags(10) == Map(0L -> false, 1L -> true, 2L -> false, 3L -> true))
    // forced overflow (cluster of 4 > maxCluster 2): only the copy of
    // the REPRESENTATIVE is caught — recall loss, never false flags
    assert(flags(2) == Map(0L -> false, 1L -> true, 2L -> false, 3L -> false))
  }

  test("distributed refinement recovers true cluster means from a biased seed") {
    val s = spark
    import s.implicits._
    // two well-separated clusters; the local sample-trained seed is made
    // deliberately bad by handing refine a pair of off-center centroids
    val rnd = new scala.util.Random(3)
    val data = (0 until 200).map { i =>
      val center = if (i % 2 == 0) 10f else -10f
      i.toLong -> Seq.fill(8)(center + rnd.nextGaussian().toFloat * 0.1f)
    }.toDF("vec_id", "embedding")
    val seedCs = Array(Array.fill(8)(3.0), Array.fill(8)(-1.0)) // off-center
    def cost(cs: Array[Array[Double]]): Double =
      data.select(least((0 until 2).map(c =>
        graft.functions.VectorOps.sq_l2_dist(col("embedding"),
          typedlit(cs(c).toSeq))): _*).as("d"))
        .agg(sum(col("d"))).head.getDouble(0)
    val refined = Similarity.refineCentroidsDistributed(data, "embedding", seedCs, iters = 3)
    assert(cost(refined) < cost(seedCs) / 100,
      "full-corpus Lloyd iterations must collapse the off-center seed onto the true means")
    refined.foreach(c => assert(math.abs(math.abs(c.head) - 10.0) < 0.2,
      s"refined centroid must sit on a cluster mean, got ${c.head}"))
    // deterministic: same input, same result
    val again = Similarity.refineCentroidsDistributed(data, "embedding", seedCs, iters = 3)
    assert(refined.flatten.toSeq == again.flatten.toSeq)
    // end-to-end entry point: same search results as the plain trained path
    // at full probe (both are exact at nprobe = nlist)
    val q = embDf.filter(col("vec_id") === 0)
    val cs = Similarity.trainIvfCentroidsDistributed(embDf, "embedding", 4,
      refineIters = 1)
    val got = Similarity.ivfTopKWith(embDf, q, "vec_id", "embedding", 4, cs, nprobe = 4)
      .orderBy("rank").collect().map(_.getAs[Long]("neighbor_id"))
    assert(got.head == 0L && got(1) == 1L)
  }

  test("pqCodeCol: m entries, each a valid codeword index; exact sub-vectors reconstruct") {
    val s = spark
    import s.implicits._
    // corpus whose sub-vectors all appear verbatim in the codebooks →
    // quantization error is exactly zero and the code identifies each
    // sub-vector uniquely
    val cb = Array.tabulate(2)(j => Array.tabulate(4)(c =>
      Array.tabulate(2)(i => (j * 100 + c * 10 + i).toDouble)))
    val vecs = for (a <- 0 until 4; b <- 0 until 4) yield
      (a * 4 + b).toLong -> (cb(0)(a) ++ cb(1)(b)).map(_.toFloat).toSeq
    val df = vecs.toDF("vec_id", "embedding")
    val got = df.select(col("vec_id"),
        Similarity.pqCodeCol(col("embedding"), cb).as("code"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got.size == 16)
    got.foreach { case (id, code) =>
      assert(code.length == 2 && code.forall(c => c >= 0 && c < 4))
      assert(code == Seq((id / 4).toInt, (id % 4).toInt),
        s"zero-error corpus must round-trip through its code, got $code for $id")
    }
  }

  test("pq ADC distance equals exact squared L2 on a zero-error corpus") {
    val s = spark
    import s.implicits._
    val cb = Array.tabulate(2)(j => Array.tabulate(4)(c =>
      Array.tabulate(2)(i => (j * 100 + c * 10 + i).toDouble)))
    val vecs = for (a <- 0 until 4; b <- 0 until 4) yield
      (a * 4 + b).toLong -> (cb(0)(a) ++ cb(1)(b)).map(_.toFloat).toSeq
    val df = vecs.toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") === 5)
    // with zero quantization error, ADC == exact distance, so PQ ranking
    // must equal exact L2 ranking (self first at distance 0)
    val pq = Similarity.pqTopKWith(df, q, "vec_id", "embedding", 16, cb)
      .orderBy("rank").collect()
    val exact = df.crossJoin(q.select(col("embedding").as("__q")))
      .select(col("vec_id"),
        graft.functions.VectorOps.sq_l2_dist(col("embedding"), col("__q")).as("d"))
      .orderBy(col("d"), col("vec_id")).collect().map(_.getLong(0))
    assert(pq.map(_.getAs[Long]("neighbor_id")).toSeq == exact.toSeq)
    assert(pq.head.getAs[Long]("neighbor_id") == 5L, "self is rank 1 at ADC 0")
  }

  test("trained PQ finds the planted near-neighbor; codebooks deterministic") {
    val q = embDf.filter(col("vec_id") === 0)
    val got = Similarity.pqTopK(embDf, q, "vec_id", "embedding", 4, m = 4, ksub = 8)
      .orderBy("rank").collect().map(_.getAs[Long]("neighbor_id"))
    assert(got.take(2).toSet == Set(0L, 1L),
      s"query and its 0.01-jitter share a code cell, got ${got.toSeq}")
    val cb1 = Similarity.pqTrainCodebooks(embDf, "embedding", 4, 8)
    val cb2 = Similarity.pqTrainCodebooks(embDf, "embedding", 4, 8)
    assert(cb1.flatten.flatten.toSeq == cb2.flatten.flatten.toSeq)
  }

  test("IVF-PQ at nprobe = nlist ranks exactly like PQ-flat") {
    val q = embDf.filter(col("vec_id") < 3)
    val cents = Similarity.fixedCentroids(nlist = 4, dim = 16, seed = 7L)
    val cb = Similarity.pqFixedCodebooks(m = 4, ksub = 8, dim = 16, seed = 11L)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val flat = rows(Similarity.pqTopKWith(embDf, q, "vec_id", "embedding", 4, cb))
    val ivfpq = rows(Similarity.ivfPqTopKWith(embDf, q, "vec_id", "embedding", 4,
      cents, cb, nprobe = 4))
    assert(ivfpq == flat, "full-probe IVF-PQ must degenerate to PQ-flat")
    // partial probe returns ≤ k rows per query, all from probed cells
    val partial = Similarity.ivfPqTopKWith(embDf, q, "vec_id", "embedding", 4,
      cents, cb, nprobe = 2)
    assert(partial.groupBy("query_id").count().collect().forall(_.getLong(1) <= 4))
  }

  test("lshBucket is deterministic across invocations (seeded planes)") {
    val planes = Similarity.hyperplanes(8, 16, seed = 42L)
    val planes2 = Similarity.hyperplanes(8, 16, seed = 42L)
    assert(planes.flatten.toSeq == planes2.flatten.toSeq)
    val b1 = embDf.select(Similarity.lshBucket(col("embedding"), planes).as("b"))
      .collect().map(_.getLong(0)).toSeq
    val b2 = embDf.select(Similarity.lshBucket(col("embedding"), planes).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(b1 == b2)
  }

  test("pqTopKReranked: corpus-wide shortlist equals exact L2 ranking; shortlist must cover k") {
    val q = embDf.filter(col("vec_id") === 0)
    val n = embDf.count().toInt
    val cb = Similarity.pqTrainCodebooks(embDf, "embedding", 4, 8)
    // shortlist = whole corpus → rerank IS the exact L2 window, whatever
    // the codes got wrong
    val got = Similarity.pqTopKReranked(embDf, q, "vec_id", "embedding",
        4, n, cb)
      .orderBy("rank").collect().map(_.getAs[Long]("neighbor_id")).toSeq
    val exact = embDf.crossJoin(q.select(col("embedding").as("__q")))
      .select(col("vec_id"),
        graft.functions.VectorOps.sq_l2_dist(col("embedding"), col("__q")).as("d"))
      .orderBy(col("d"), col("vec_id")).limit(4)
      .collect().map(_.getLong(0)).toSeq
    assert(got == exact)
    assert(got.take(2) == Seq(0L, 1L), "self then its 0.01-jitter twin")
    intercept[IllegalArgumentException] {
      Similarity.pqTopKReranked(embDf, q, "vec_id", "embedding", 5, 4, cb)
    }
  }

  test("pqTopKReranked: exact rerank corrects ADC misordering inside the shortlist") {
    val s = spark
    import s.implicits._
    // 1-subspace codebook with 2 codewords at 0 and 10: vecs 1.0 and 4.0
    // share codeword 0 (ADC ties them — distance to the CODEWORD, not the
    // vector), so ADC order vs query 1.1 is id-tie-broken, while exact L2
    // must put 1.0 first regardless of ids
    val cb = Array(Array(Array(0.0), Array(10.0)))
    val df = Seq(
      (5L, Seq(4.0f)), (7L, Seq(1.0f)), (9L, Seq(10.0f))
    ).toDF("vec_id", "embedding")
    val q = Seq((0L, Seq(1.1f))).toDF("vec_id", "embedding")
    val plain = Similarity.pqTopKWith(df, q, "vec_id", "embedding", 1, cb)
      .head().getAs[Long]("neighbor_id")
    assert(plain == 5L, "ADC ties 5 and 7 at codeword 0 and keeps the lower id")
    val reranked = Similarity.pqTopKReranked(df, q, "vec_id", "embedding",
        1, 2, cb)
      .head().getAs[Long]("neighbor_id")
    assert(reranked == 7L, "exact L2 over the shortlist recovers the true NN")
  }

  test("hardNegatives: equals the brute banded ranking; band excludes self and opposite") {
    val df = embDf
    val q = df.filter(col("vec_id") === 0L)
    // first-principles truth over the same fixture
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val base = rows.find(_._1 == 0L).get._2
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val want = rows.map { case (id, v) => (id, cos(base, v)) }
      .filter { case (_, s) => s >= 0.3 && s < 0.98 }
      .sortBy { case (id, s) => (-s, id) }
      .take(10).map(_._1).toSeq
    assert(want.nonEmpty, "fixture must have in-band vectors")
    val got = Similarity.hardNegatives(df, q, "vec_id", "embedding",
        k = 10, lo1e3 = 300, hi1e3 = 980)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getInt(2)))
    assert(got.map(_._1).toSeq === want)
    assert(got.map(_._2).toSeq === (1 to want.size))
    assert(!got.map(_._1).contains(0L), "self (cos 1.0) excluded by the ceiling")
    assert(!got.map(_._1).contains(3L), "opposite (cos -1) excluded by the floor")
    intercept[IllegalArgumentException] {
      Similarity.hardNegatives(df, q, "vec_id", "embedding", 5, 900, 900)
    }
  }
}
