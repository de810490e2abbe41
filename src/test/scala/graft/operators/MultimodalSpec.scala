package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {

  private def mediaDf = {
    val s = spark
    import s.implicits._
    Multimodal.attachFakeMedia(
      Seq((0L, "hello world"), (1L, "a much longer document body right here"))
        .toDF("doc_id", "text"),
      "doc_id", "text")
  }

  test("media struct schema matches the declared contract") {
    val mt = mediaDf.schema("media").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    // nullability differs for literal-backed fields; names+types are the contract
    assert(mt.fields.map(f => (f.name, f.dataType)).toSeq ==
      Multimodal.mediaType.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("extractFeatures: partition-local decode produces fixed-dim vectors") {
    val out = Multimodal.extractFeatures(mediaDf, "doc_id").orderBy("doc_id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("byte_len") == 11L)
    val f0 = out(0).getSeq[Float](out(0).fieldIndex("features")).toList
    assert(f0.length == Multimodal.featureDim)
    // deterministic: same bytes → same features
    val again = Multimodal.extractFeatures(mediaDf, "doc_id").orderBy("doc_id")
      .collect()(0)
    assert(f0 == again.getSeq[Float](again.fieldIndex("features")).toList)
  }

  test("synthesizeBmp → decodeImage round-trips dimensions and exact pixel sums") {
    // local (no Spark) check of the codec pair: decode what we encoded
    // and compare against the closed-form channel sums
    val (seed, w, h) = (42L, 30, 17) // w=30: row stride 90 → padded to 92
    val stats = Multimodal.decodeImage(Multimodal.synthesizeBmp(seed, w, h)).get
    assert(stats.width == w && stats.height == h)
    def sumOver(f: (Int, Int) => Long): Long =
      (for (x <- 0 until w; y <- 0 until h) yield f(x, y)).sum
    assert(stats.sumR == sumOver((x, y) => (seed + x + y) % 256))
    assert(stats.sumG == sumOver((x, _) => (3 * seed + x) % 256))
    assert(stats.sumB == sumOver((_, y) => (7 * seed + y) % 256))
  }

  test("resizeImage: exact integer box-filter, identity at same size, " +
       "non-multiple dims and junk rejected") {
    val src = Multimodal.synthesizeBmp(seed = 5L, w = 8, h = 4)
    // 8x4 -> 2x2: each output pixel = floor-average of a 4x2 block,
    // recomputed here from the synthesis closed forms
    val resized = Multimodal.resizeImage(src, 2, 2).get
    val stats = Multimodal.decodeImage(resized).get
    def ch(f: (Int, Int) => Int): Long = {
      var total = 0L
      for (v <- 0 until 2; u <- 0 until 2) {
        var s = 0L
        for (dy <- 0 until 2; dx <- 0 until 2 * 2)
          s += f(u * 4 + dx, v * 2 + dy)
        total += s / 8
      }
      total
    }
    assert(stats.width == 2 && stats.height == 2)
    assert(stats.sumR == ch((x, y) => (5 + x + y) % 256))
    assert(stats.sumG == ch((x, y) => (15 + x) % 256))
    assert(stats.sumB == ch((x, y) => (35 + y) % 256))
    // identity: resizing to the input's own dims reproduces the sums
    val same = Multimodal.decodeImage(Multimodal.resizeImage(src, 8, 4).get).get
    val orig = Multimodal.decodeImage(src).get
    assert((same.sumR, same.sumG, same.sumB) == (orig.sumR, orig.sumG, orig.sumB))
    // non-multiple grid and undecodable payloads degrade to None
    assert(Multimodal.resizeImage(src, 3, 2).isEmpty)
    assert(Multimodal.resizeImage("junk".getBytes, 2, 2).isEmpty)
  }

  test("synthesizeWav → decodeAudio round-trips format and exact sample sum") {
    val (seed, n, rate) = (123L, 400, 8000)
    val stats = Multimodal.decodeAudio(Multimodal.synthesizeWav(seed, n, rate)).get
    assert(stats.sampleRate == rate && stats.channels == 1 && stats.nSamples == n)
    val expect = (0 until n).map(i =>
      java.lang.Math.floorMod(seed * 31 + i.toLong * 7, 65536L) - 32768).sum
    assert(stats.sumSamples == expect)
  }

  test("decodeAudio rejects non-audio bytes instead of throwing") {
    assert(Multimodal.decodeAudio("not audio at all".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeAudio(null).isEmpty)
    // a BMP is decodable media but not audio
    assert(Multimodal.decodeAudio(Multimodal.synthesizeBmp(1L, 8, 8)).isEmpty)
  }

  test("decodeImage rejects non-image bytes instead of throwing") {
    assert(Multimodal.decodeImage("not an image".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeImage(null).isEmpty)
    assert(Multimodal.decodeImage(Array[Byte]()).isEmpty)
    // truncated payload with a valid magic: codecs may throw runtime
    // exceptions (not just IOException) — must degrade to None
    assert(Multimodal.decodeImage(
      Multimodal.synthesizeBmp(5L, 16, 16).take(60)).isEmpty)
  }

  test("synthesizeGif → decodeFrames round-trips every frame's exact gray sum") {
    val (seed, w, h, n) = (42L, 8, 5, 4)
    val frames = Multimodal.decodeFrames(Multimodal.synthesizeGif(seed, w, h, n))
    assert(frames.length == n)
    frames.foreach { f =>
      assert(f.width == w && f.height == h)
      val expect = (for { y <- 0 until h; x <- 0 until w }
        yield java.lang.Math.floorMod(seed + 11L * f.frameIdx + x + y, 256L)).sum
      assert(f.sumGray == expect, s"frame ${f.frameIdx}")
    }
    // undecodable → Nil, not a throw
    assert(Multimodal.decodeFrames("not a gif".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeFrames(null).isEmpty)
    // distributed: one row per (doc, frame)
    val s = spark
    import s.implicits._
    val ids = Seq(0L, 7L).toDF("doc_id")
    val stats = Multimodal.frameStats(
      Multimodal.attachSyntheticGifs(ids, "doc_id", w, h, n), "doc_id")
    assert(stats.count() == 2L * n)
  }

  test("decodeAudio rejects non-PCM_SIGNED 16-bit payloads instead of mis-summing") {
    // hand-built 8-bit unsigned PCM WAV: valid RIFF, wrong encoding for
    // the signed-16-bit summing loop → None, not a silently wrong sum
    val n = 16
    val buf = java.nio.ByteBuffer.allocate(44 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(8000)
      .putShort(1).putShort(8) // 8-bit PCM (WAV 8-bit is unsigned)
    buf.put("data".getBytes("US-ASCII")).putInt(n)
    (0 until n).foreach(i => buf.put((i * 16).toByte))
    assert(Multimodal.decodeAudio(buf.array()).isEmpty)
    // truncated WAV: javax.sound streams the bytes that exist — partial
    // decode (or None) is fine; throwing is not
    Multimodal.decodeAudio(Multimodal.synthesizeWav(3L, 64).take(50))
  }

  test("imageStats decodes synthesized images distributively; image mime routes extractFeatures") {
    val s = spark
    import s.implicits._
    val ids = Seq(0L, 7L, 300L).toDF("doc_id")
    val withImgs = Multimodal.attachSyntheticImages(ids, "doc_id", 8, 5)
    val stats = Multimodal.imageStats(withImgs, "doc_id").orderBy("doc_id").collect()
    assert(stats.length == 3 && stats.forall(_.getInt(1) == 8))
    // row for id 0: sum_g = sum over x of (0*3+x)%256 × h = (0+..+7)*5
    assert(stats(0).getLong(3 + 1) == 28L * 5)
    // extractFeatures uses the decode path for image/* — features carry
    // real dimensions, not hash noise
    val feats = Multimodal.extractFeatures(withImgs, "doc_id")
      .orderBy("doc_id").collect()
    val f = feats(0).getSeq[Float](feats(0).fieldIndex("features"))
    assert(f(0) == 8f && f(1) == 5f && f(7) == 1f)
  }

  test("aHash64: identical images hash identically, pattern twins land a few bits away") {
    val a = Multimodal.aHash64(Multimodal.synthesizePatternBmp(42L, 0, 32, 16))
    val a2 = Multimodal.aHash64(Multimodal.synthesizePatternBmp(42L, 0, 32, 16))
    assert(a.isDefined && a == a2, "same pixels must give the same hash")
    // the variant-1 twin reflects exactly two cells — its hash stays
    // within a small Hamming distance while a DIFFERENT pattern id is far
    val twin = Multimodal.aHash64(Multimodal.synthesizePatternBmp(42L, 1, 32, 16))
    val other = Multimodal.aHash64(Multimodal.synthesizePatternBmp(43L, 0, 32, 16))
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    // two direct reflections plus possible mean-shift collateral on
    // borderline cells — near, but not exactly 2
    assert(ham(a.get, twin.get) <= 8, s"twin too far: ${ham(a.get, twin.get)}")
    assert(ham(a.get, other.get) > ham(a.get, twin.get),
      s"distinct pattern (${ham(a.get, other.get)}) must be farther than the twin")
  }

  test("aHash64: undecodable and sub-grid payloads yield None, never throw") {
    assert(Multimodal.aHash64(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.aHash64(null).isEmpty)
    // 4×5 image is smaller than the 8×8 cell grid
    assert(Multimodal.aHash64(Multimodal.synthesizeBmp(1L, 4, 5)).isEmpty)
    // truncated real header must degrade, not throw
    assert(Multimodal.aHash64(Multimodal.synthesizeBmp(1L, 16, 16).take(40)).isEmpty)
  }

  test("imageAHashes drops undecodable rows and is exact for the closed form") {
    val s = spark
    import s.implicits._
    val ids = Seq(0L, 5L).toDF("doc_id")
    val imgs = Multimodal.attachPatternImages(
      ids.select(col("doc_id"), col("doc_id").as("p"), lit(0).as("v")),
      "doc_id", "p", "v", 32, 16)
    val got = Multimodal.imageAHashes(imgs, "doc_id").orderBy("doc_id").collect()
    assert(got.length == 2)
    // mirror the closed form in-process: cell gray ((t²) div 32) mod 256,
    // bit cj*8+ci set when 64·g > Σg
    def expected(pid: Long): Long = {
      val g = for (cj <- 0 until 8; ci <- 0 until 8) yield {
        val t = 73L * pid + 17L * ci + 29L * cj + 7L
        (t * t / 32L) % 256L
      }
      val tot = g.sum
      g.zipWithIndex.foldLeft(0L) { case (h, (gv, b)) =>
        if (64L * gv > tot) h | (1L << b) else h
      }
    }
    assert(got(0).getLong(1) == expected(0L) && got(1).getLong(1) == expected(5L))
  }

  test("audioHash64: identical clips hash identically, pattern twins land a few bits away") {
    val a = Multimodal.audioHash64(Multimodal.synthesizePatternWav(42L, 0, 25))
    val a2 = Multimodal.audioHash64(Multimodal.synthesizePatternWav(42L, 0, 25))
    assert(a.isDefined && a == a2, "same samples must give the same hash")
    val twin = Multimodal.audioHash64(Multimodal.synthesizePatternWav(42L, 1, 25))
    val other = Multimodal.audioHash64(Multimodal.synthesizePatternWav(43L, 0, 25))
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    // two direct reflections plus possible mean-shift collateral on
    // borderline frames — near, but not exactly 2
    assert(ham(a.get, twin.get) <= 8, s"twin too far: ${ham(a.get, twin.get)}")
    assert(ham(a.get, other.get) > ham(a.get, twin.get),
      s"distinct pattern (${ham(a.get, other.get)}) must be farther than the twin")
  }

  test("audioHash64: undecodable, non-PCM, and sub-grid payloads yield None, never throw") {
    assert(Multimodal.audioHash64(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.audioHash64(null).isEmpty)
    // 32 samples is shorter than the 64-frame grid
    assert(Multimodal.audioHash64(Multimodal.synthesizeWav(1L, 32)).isEmpty)
    // truncated real header must degrade, not throw
    assert(Multimodal.audioHash64(Multimodal.synthesizeWav(1L, 400).take(40)).isEmpty)
  }

  test("audioHashes drops undecodable rows and is exact for the closed form") {
    val s = spark
    import s.implicits._
    val ids = Seq(0L, 5L).toDF("doc_id")
    val clips = Multimodal.attachPatternAudio(
      ids.select(col("doc_id"), col("doc_id").as("p"), lit(0).as("v")),
      "doc_id", "p", "v", samplesPerFrame = 25)
    val got = Multimodal.audioHashes(clips, "doc_id").orderBy("doc_id").collect()
    assert(got.length == 2)
    // mirror the closed form in-process: frame value ((t²) div 32) mod
    // 4096, bit f set when 64·v > Σv (equal constant frames: the
    // cross-multiplied average compare reduces to exactly this)
    def expected(pid: Long): Long = {
      val g = (0 until 64).map { f =>
        val t = 73L * pid + 31L * f + 11L
        (t * t / 32L) % 4096L
      }
      val tot = g.sum
      g.zipWithIndex.foldLeft(0L) { case (h, (gv, b)) =>
        if (64L * gv > tot) h | (1L << b) else h
      }
    }
    assert(got(0).getLong(1) == expected(0L) && got(1).getLong(1) == expected(5L))
  }

  test("audioHash64 abs-energy: a zero-mean waveform does not collapse to an empty hash") {
    // synthesizeWav's ramp alternates sign; a signed (non-abs) frame sum
    // would cancel toward 0 on every frame and the compare would set an
    // arbitrary bit pattern driven by rounding, not energy. With abs the
    // hash is deterministic and the decode path exercises negatives.
    val h = Multimodal.audioHash64(Multimodal.synthesizeWav(7L, 6400))
    val h2 = Multimodal.audioHash64(Multimodal.synthesizeWav(7L, 6400))
    assert(h.isDefined && h == h2)
  }

  test("sampleFrames emits n frames with in-range offsets") {
    val frames = Multimodal.sampleFrames(mediaDf, "doc_id", 4)
      .filter(col("doc_id") === 1).orderBy("frame_idx").collect()
    assert(frames.length == 4)
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3))
    val f = frames.map(_.getAs[Array[Byte]]("frame_bytes"))
    assert(f.forall(b => b.length > 0 && b.length <= 16))
  }
}
