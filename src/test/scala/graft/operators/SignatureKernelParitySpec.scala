package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins the per-doc signature kernels (mapPartitions fast path, r19) to
  * the exploded window+aggregate formulation they replaced. The fallback
  * path still exists for non-integral ids, so the equality is checked by
  * running the SAME operator twice — long ids (kernel) vs string ids
  * (exploded) — over a corpus chosen to stress every place the two
  * could diverge: unicode whitespace classes, NBSP (NOT \s in Java),
  * vertical tab (\s in Java but not RE2), non-ASCII lowercasing
  * (Turkish dotted İ, sharp ß, fullwidth letters), combining marks,
  * nulls, empties, 1-token and k-1-token docs, multi-space runs, and
  * within-doc repeated shingles.
  */
class SignatureKernelParitySpec extends SparkTestBase {

  private def corpus = {
    val s = spark
    import s.implicits._
    Seq(
      (0L, "plain ascii text with several tokens for shingling"),
      (1L, "  leading  and   trailing   runs  "),
      (2L, "tab\tand\nnewlinevertical\ftab\rmixed"),
      (3L, "nbsp glued tokens stay glued"),
      (4L, "Turkish İstanbul Iı DOTTED"),
      (5L, "sharp STRASSE straße and fullwidth ＡＢＣ"),
      (6L, "combining é acute vs precomposed é forms"),
      (7L, null.asInstanceOf[String]),
      (8L, ""),
      (9L, "solo"),
      (10L, "two tokens"),
      (11L, "a a a a a repeated repeated repeated"),
      (12L, "MiXeD CaSe UPPER lower Title"),
      (13L, "Ångström Ümlauts Øslash"),
      (14L, "  "),
      (15L, "ZZ top aa bottom ZZ top aa bottom"))
      .toDF("doc_id", "text")
  }

  private def viaKernel = corpus
  private def viaExploded = corpus
    .select(concat(lit("k"), col("doc_id").cast("string")).as("doc_id"),
      col("text"))

  private def normalizeId = udf((s: String) => s.drop(1).toLong)

  test("minhashSignatureMd5: kernel equals exploded formulation") {
    val fast = Dedup.minhashSignatureMd5(viaKernel, "doc_id", "text", 3, 8)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val slow = Dedup.minhashSignatureMd5(viaExploded, "doc_id", "text", 3, 8)
      .collect().map(r => r.getString(0).drop(1).toLong -> r.toSeq.tail).toMap
    assert(fast.keySet == slow.keySet)
    fast.keys.foreach(k => assert(fast(k) == slow(k), s"doc $k"))
    assert(!fast.contains(7L)) // null text drops out on both paths
    assert(fast.contains(8L) && fast.contains(14L)) // empty text keeps a row
  }

  test("minhashSignatureMd5WithSets: lanes and distinct shingle sets equal") {
    val fast = Dedup.minhashSignatureMd5WithSets(viaKernel, "doc_id", "text", 3, 8)
      .collect()
      .map(r => r.getLong(0) ->
        ((1 to 8).map(r.get), r.getSeq[String](9).sorted)).toMap
    val slow = Dedup.minhashSignatureMd5WithSets(viaExploded, "doc_id", "text", 3, 8)
      .collect()
      .map(r => r.getString(0).drop(1).toLong ->
        ((1 to 8).map(r.get), r.getSeq[String](9).sorted)).toMap
    assert(fast.keySet == slow.keySet)
    fast.keys.foreach(k => assert(fast(k) == slow(k), s"doc $k"))
  }

  test("minhashSignature (xxhash64 lanes): kernel equals exploded formulation") {
    val fast = Dedup.minhashSignature(viaKernel, "doc_id", "text", 3, 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val slow = Dedup.minhashSignature(viaExploded, "doc_id", "text", 3, 16)
      .collect().map(r => r.getString(0).drop(1).toLong -> r.getSeq[Long](1)).toMap
    assert(fast.keySet == slow.keySet)
    fast.keys.foreach(k => assert(fast(k) == slow(k), s"doc $k"))
  }

  test("simhash (xxhash64): kernel equals exploded formulation") {
    val fast = Dedup.simhash(viaKernel, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val slow = Dedup.simhash(viaExploded, "doc_id", "text")
      .collect().map(r => r.getString(0).drop(1).toLong -> r.getLong(1)).toMap
    assert(fast.keySet == slow.keySet)
    fast.keys.foreach(k => assert(fast(k) == slow(k), s"doc $k"))
  }

  test("simhashMd5: kernel equals exploded formulation") {
    val fast = Dedup.simhashMd5(viaKernel, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val slow = Dedup.simhashMd5(viaExploded, "doc_id", "text")
      .collect().map(r => r.getString(0).drop(1).toLong -> r.getString(1)).toMap
    assert(fast.keySet == slow.keySet)
    fast.keys.foreach(k => assert(fast(k) == slow(k), s"doc $k"))
  }

  test("winnowFingerprints: kernel equals window formulation") {
    val fast = Dedup.winnowFingerprints(viaKernel, "doc_id", "text", 2, 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val slow = Dedup.winnowFingerprints(viaExploded, "doc_id", "text", 2, 3)
      .collect().map(r => r.getString(0).drop(1).toLong ->
        (r.getLong(1), r.getString(2))).toMap
    assert(fast.keySet == slow.keySet)
    fast.keys.foreach(k => assert(fast(k) == slow(k), s"doc $k"))
  }

  test("winnowOverlapPairs: kernel equals window formulation") {
    val fast = Dedup.winnowOverlapPairs(viaKernel, "doc_id", "text", 2, 3,
        minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val slow = Dedup.winnowOverlapPairs(viaExploded, "doc_id", "text", 2, 3,
        minShared = 1L)
      .collect().map(r => (r.getString(0).drop(1).toLong,
        r.getString(1).drop(1).toLong, r.getLong(2))).toSet
    assert(fast == slow)
  }

  test("exciseDuplicateSpans: kernel equals window formulation") {
    val fast = Dedup.exciseDuplicateSpans(viaKernel, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val slow = Dedup.exciseDuplicateSpans(viaExploded, "doc_id", "text", k = 3)
      .collect().map(r => r.getString(0).drop(1).toLong ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(fast.keySet == slow.keySet)
    fast.keys.foreach(k => assert(fast(k) == slow(k), s"doc $k"))
  }

  test("AllPairs.cosinePairs: kernel element rows equal exploded formulation") {
    val fast = AllPairs.cosinePairs(viaKernel, "doc_id", "text", 300, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val slow = AllPairs.cosinePairs(viaExploded, "doc_id", "text", 300, 2)
      .collect().map(r => (r.getString(0).drop(1).toLong,
        r.getString(1).drop(1).toLong, r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    // ids order differently as strings ("k10" < "k2") — compare as
    // unordered pairs plus evidence
    def canon(s: Set[(Long, Long, Long, Long, Long)]) =
      s.map { case (a, b, na, nb, c) =>
        if (a < b) (a, b, na, nb, c) else (b, a, nb, na, c) }
    assert(canon(fast) == canon(slow))
  }

  test("repetitionSignals: kernel equals window formulation") {
    val fast = TextAnalysis.repetitionSignals(viaKernel, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val slow = TextAnalysis.repetitionSignals(viaExploded, "doc_id", "text")
      .collect().map(r => r.getString(0).drop(1).toLong -> r.toSeq.tail).toMap
    assert(fast.keySet == slow.keySet)
    fast.keys.foreach(k => assert(fast(k) == slow(k), s"doc $k"))
  }

  test("boilerplateStats: kernel equals window formulation") {
    val fast = TextAnalysis.boilerplateStats(viaKernel, "doc_id", "text", 2, 2)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val slow = TextAnalysis.boilerplateStats(viaExploded, "doc_id", "text", 2, 2)
      .collect().map(r => r.getString(0).drop(1).toLong -> r.toSeq.tail).toMap
    assert(fast.keySet == slow.keySet)
    fast.keys.foreach(k => assert(fast(k) == slow(k), s"doc $k"))
  }

  test("shingleRepeatStats: kernel equals exploded formulation") {
    val fast = Dedup.shingleRepeatStats(viaKernel, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val slow = Dedup.shingleRepeatStats(viaExploded, "doc_id", "text", 3)
      .collect().map(r => r.getString(0).drop(1).toLong -> r.toSeq.tail).toMap
    assert(fast.keySet == slow.keySet)
    fast.keys.foreach(k => assert(fast(k) == slow(k), s"doc $k"))
    assert(!fast.contains(7L)) // null text drops out on both paths
    // within-doc repeats: 8 tokens → 6 shingles, "a a a" ×3 collapses
    assert(fast(11L) == Seq(6L, 4L))
  }

  test("NgramLm scoring: per-doc gram kernel equals the exploded formulation") {
    val (tri, bi, uni) = NgramLm.trainTrigram(viaKernel, "text")
    val fast = NgramLm.scoreTrigram(viaKernel, "doc_id", "text", tri, bi, uni)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val slow = NgramLm.scoreTrigram(viaExploded, "doc_id", "text", tri, bi, uni)
      .collect().map(r => r.getString(0).drop(1).toLong -> r.toSeq.tail).toMap
    assert(fast.keySet == slow.keySet)
    fast.keys.foreach(k => assert(fast(k) == slow(k), s"doc $k"))
    val (bi2, uni2) = NgramLm.trainBigram(viaKernel, "text")
    val fastB = NgramLm.scoreBigram(viaKernel, "doc_id", "text", bi2, uni2)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val slowB = NgramLm.scoreBigram(viaExploded, "doc_id", "text", bi2, uni2)
      .collect().map(r => r.getString(0).drop(1).toLong -> r.toSeq.tail).toMap
    assert(fastB.keySet == slowB.keySet)
    fastB.keys.foreach(k => assert(fastB(k) == slowB(k), s"doc $k"))
  }

  test("normTextJvm equals the normText column over the adversarial corpus") {
    val viaCol = corpus.select(col("doc_id"), Dedup.normText(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    corpus.collect().foreach { r =>
      val id = r.getLong(0)
      val t = r.getString(1)
      val jvm = if (t == null) null else Dedup.normTextJvm(t)
      assert(jvm == viaCol(id), s"doc $id")
    }
  }

  test("integer ids round-trip through the kernel with their type intact") {
    val s = spark
    import s.implicits._
    val df = Seq((1, "alpha beta gamma delta"), (2, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val out = Dedup.minhashSignatureMd5(df, "doc_id", "text", 3, 8)
    assert(out.schema("doc_id").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(out.count() == 2)
  }
}
