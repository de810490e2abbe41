package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: images/audio/video ride as opaque `BINARY`
  * columns with a typed metadata struct; decode / feature-extraction /
  * frame-sampling run as partition-local batch operators.
  *
  * IMAGE decode is REAL: [[decodeImage]] uses the JDK's `javax.imageio`
  * (PNG/BMP/GIF/JPEG — zero external dependencies), and [[imageStats]]
  * emits exact integer channel sums so the result is bit-portable and
  * oracle-checkable. Payloads that are not decodable images (audio/video
  * codecs are absent from the JDK) fall back to [[byteHashFeatures]], a
  * deterministic content-hash vector — honest placeholder features, with
  * the same shape a real audio/video decoder would fill in.
  *
  * Scale notes: media payloads never shuffle — every operator here is a
  * narrow `mapPartitions`; feature vectors (small) are what downstream
  * joins/aggregations move. Partition sizing for 100 TB of media comes
  * from `spark.sql.files.maxPartitionBytes` at the binary-file source.
  */
object Multimodal {

  // ImageIO's default stream cache writes spill files per decode; media
  // payloads are already in executor memory, so cache in-heap
  javax.imageio.ImageIO.setUseCache(false)

  /** media struct: payload + the metadata a real pipeline carries. */
  val mediaType: StructType = StructType(Seq(
    StructField("bytes", BinaryType),
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  val featureDim = 8

  /** Wrap a text corpus as fake media rows (UTF-8 bytes + synthesized
    * metadata) — the test harness for the plumbing, since the driver
    * testdata has no binary table.
    */
  def attachFakeMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      struct(
        encode(col(textCol), "UTF-8").as("bytes"),
        lit("application/octet-stream").as("mime"),
        (octet_length(encode(col(textCol), "UTF-8")) % 1024).cast("int").as("width"),
        lit(64).as("height"),
        (octet_length(encode(col(textCol), "UTF-8")) * 10L).as("duration_ms"))
        .as("media"))

  /** Fallback feature vector for payloads with no JDK codec (audio,
    * video, unknown blobs): deterministic content-hash features derived
    * from the engine's rolling hash (single source of truth for the byte
    * loop). The signature (bytes → fixed-dim Array[Float]) matches what a
    * real decoder produces, so downstream similarity/dedup operators are
    * agnostic to which path filled the vector.
    */
  def byteHashFeatures(bytes: Array[Byte]): Array[Float] = {
    val h = graft.functions.RollingHash.hashBytes(bytes)
    Array.tabulate(featureDim) { d =>
      val v = (h ^ (h >>> (d + 1))) * 0x9E3779B97F4A7C15L
      ((v >>> 40).toFloat / (1 << 24).toFloat) - 0.5f
    }
  }

  /** Exact per-image pixel statistics from a REAL decode. */
  final case class ImageStats(width: Int, height: Int,
                              sumR: Long, sumG: Long, sumB: Long)

  /** Decode an image payload with `javax.imageio` (PNG/BMP/GIF/JPEG in
    * any JDK — no external codecs) and reduce it to exact integer channel
    * sums. Returns None for bytes that are not a decodable image, letting
    * callers fall back to [[byteHashFeatures]]. Integer sums rather than
    * float means: bit-portable across engines, and any pixel-level decode
    * divergence shifts the sum by a detectable integer amount.
    */
  def decodeImage(bytes: Array[Byte]): Option[ImageStats] = {
    if (bytes == null || bytes.length < 8) return None
    // Corrupt real-world payloads make ImageIO throw more than IOException
    // (IllegalArgumentException, CMMException, codec AIOOBE…) — any decode
    // failure must degrade to None, never fail the task at corpus scale.
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) None
    else {
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val p = img.getRGB(x, y)
          sr += (p >>> 16) & 0xFF
          sg += (p >>> 8) & 0xFF
          sb += p & 0xFF
          x += 1
        }
        y += 1
      }
      Some(ImageStats(img.getWidth, img.getHeight, sr, sg, sb))
    }
  }

  /** Deterministic uncompressed 24-bit BMP: pixel (x, y) has channels
    * r = (seed + x + y) mod 256, g = (3·seed + x) mod 256,
    * b = (7·seed + y) mod 256 — closed forms a SQL oracle reproduces
    * without any image library, so a real encode → [[decodeImage]] →
    * pixel-sum round trip is hash-checkable end to end. Bottom-up rows,
    * 4-byte row padding — the standard BITMAPINFOHEADER layout.
    */
  def synthesizeBmp(seed: Long, w: Int, h: Int): Array[Byte] =
    writeBmp24(w, h) { (x, y) =>
      (java.lang.Math.floorMod(seed + x + y, 256L).toInt,
        java.lang.Math.floorMod(3 * seed + x, 256L).toInt,
        java.lang.Math.floorMod(7 * seed + y, 256L).toInt)
    }

  /** Deterministic grayscale PATTERN image for perceptual-hash tests:
    * the 8×8 aHash cell grid maps to per-cell constant gray
    * `((t²) div 32) mod 256` with `t = 73·id + 17·ci + 29·cj + 7` — the
    * squared term makes the cell pattern NONLINEAR in (id, ci, cj), so
    * distinct ids get near-independent hashes (a plain affine-mod-256
    * mix collapses to structured collisions, and the smooth
    * [[synthesizeBmp]] gradients are perceptually degenerate outright).
    * `variant = 1` REFLECTS (255 − g) exactly two seed-chosen cells
    * (`id mod 64` and `(7·id + 13) mod 64`) — a planted near-twin a few
    * Hamming bits away. All closed forms, reproducible in SQL with no
    * image library and no 64-bit overflow (t² < 2⁶³ for any id below
    * ~4·10⁷).
    */
  def synthesizePatternBmp(id: Long, variant: Int, w: Int, h: Int): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, "pattern grid needs dims divisible by 8")
    val f1 = java.lang.Math.floorMod(id, 64L).toInt
    val f2 = java.lang.Math.floorMod(7 * id + 13, 64L).toInt
    writeBmp24(w, h) { (x, y) =>
      val ci = x * 8 / w; val cj = y * 8 / h
      val t = 73L * id + 17L * ci + 29L * cj + 7L
      val g0 = ((t * t / 32L) % 256L).toInt
      val cell = cj * 8 + ci
      val g = if (variant == 1 && (cell == f1 || cell == f2)) 255 - g0 else g0
      (g, g, g)
    }
  }

  /** Standard 24-bit bottom-up BITMAPINFOHEADER writer; `px(x, y)` gives
    * (r, g, b). The byte layout (4-byte row padding, BGR order) is the
    * contract [[decodeImage]] round-trips.
    */
  private def writeBmp24(w: Int, h: Int)(px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(w > 0 && h > 0, "image dimensions must be positive")
    val rowSize = (w * 3 + 3) / 4 * 4
    val dataSize = rowSize * h
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = h - 1 // bottom-up storage: last row first
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val (r, g, b) = px(x, y)
        buf.put(b.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      var p = w * 3
      while (p < rowSize) { buf.put(0.toByte); p += 1 }
      y -= 1
    }
    buf.array()
  }

  /** Deterministic ANIMATED GIF (the one multi-frame container the JDK
    * writes natively): `frames` full-size grayscale frames where frame f's
    * pixel (x, y) has gray value (seed + 11·f + x + y) mod 256 — a closed
    * form a SQL oracle reproduces with no image library. Grayscale keeps
    * the GIF palette exact (a 256-entry gray ramp, no quantization loss),
    * so an encode → [[decodeFrames]] → per-frame pixel-sum round trip is
    * hash-checkable end to end.
    */
  def synthesizeGif(seed: Long, w: Int, h: Int, frames: Int): Array[Byte] = {
    require(w > 0 && h > 0 && frames > 0, "gif dimensions must be positive")
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < frames) {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            raster.setSample(x, y, 0,
              java.lang.Math.floorMod(seed + 11L * f + x + y, 256L).toInt)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    baos.toByteArray
  }

  /** Exact per-frame statistics from a REAL multi-frame decode. */
  final case class FrameStats(frameIdx: Int, width: Int, height: Int,
                              sumGray: Long)

  /** Decode EVERY frame of a multi-frame image container (animated GIF —
    * `javax.imageio`'s reader exposes frames via `getNumImages`/`read(i)`)
    * and reduce each to its exact gray-channel (red) integer sum. Returns
    * Nil for undecodable payloads — same degrade-not-throw contract as
    * [[decodeImage]]/[[decodeAudio]]. Frames are read raw (our synthetic
    * frames are full-size, so no disposal compositing is needed).
    */
  def decodeFrames(bytes: Array[Byte]): Seq[FrameStats] = {
    if (bytes == null || bytes.length < 8) return Nil
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return Nil
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          (0 until n).map { i =>
            val img = reader.read(i)
            var s = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                s += (img.getRGB(x, y) >>> 16) & 0xFF
                x += 1
              }
              y += 1
            }
            FrameStats(i, img.getWidth, img.getHeight, s)
          }
        } finally reader.dispose()
      } finally iis.close()
    } catch {
      case scala.util.control.NonFatal(_) => Nil
    }
  }

  /** Wrap each row's id as a synthesized animated-GIF payload in the
    * media struct — the video-tier analogue of [[attachSyntheticImages]].
    */
  def attachSyntheticGifs(df: DataFrame, idCol: String, w: Int, h: Int,
                          frames: Int): DataFrame = {
    val outSchema = StructType(Seq(df.schema(idCol), StructField("media", mediaType)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol)).mapPartitions { it =>
      it.map { r =>
        val seed = r.getAs[Number](0).longValue()
        Row(r.get(0), Row(synthesizeGif(seed, w, h, frames), "image/gif",
          w, h, frames * 100L))
      }
    }
  }

  /** Partition-local REAL multi-frame decode: (id, media) → one row per
    * frame (id, frame_idx, fr_w, fr_h, sum_gray). Undecodable payloads
    * emit no rows (an audit joins back against the id table to find
    * them). One iterator pass per partition; nothing shuffles.
    */
  def frameStats(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("frame_idx", IntegerType),
      StructField("fr_w", IntegerType), StructField("fr_h", IntegerType),
      StructField("sum_gray", LongType)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol), col("media.bytes").as("__b"))
      .mapPartitions { it =>
        it.flatMap { r =>
          decodeFrames(r.getAs[Array[Byte]]("__b")).map(f =>
            Row(r.get(0), f.frameIdx, f.width, f.height, f.sumGray))
        }
      }
  }

  /** Exact per-clip audio statistics from a REAL decode. */
  final case class AudioStats(sampleRate: Int, channels: Int,
                              nSamples: Long, sumSamples: Long)

  /** Decode an audio payload with `javax.sound.sampled` (WAV/AIFF/AU in
    * any JDK — no external codecs) and reduce it to the exact integer
    * sum of its 16-bit PCM samples. Returns None for bytes that are not
    * a decodable clip. Same portability argument as [[decodeImage]]:
    * integer sums are bit-portable, and any header/endianness/frame-loop
    * bug shifts the sum by a detectable amount.
    */
  def decodeAudio(bytes: Array[Byte]): Option[AudioStats] = {
    if (bytes == null || bytes.length < 12) return None
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        // Only signed 16-bit PCM is summable as-is; PCM_UNSIGNED or
        // compressed encodings would sum to silently wrong values.
        if (fmt.getSampleSizeInBits != 16 ||
            fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
          return None
        val data = in.readAllBytes()
        val le = !fmt.isBigEndian
        var sum = 0L
        var i = 0
        while (i + 1 < data.length) {
          val lo = data(if (le) i else i + 1) & 0xFF
          val hi = data(if (le) i + 1 else i)
          sum += (hi << 8) | lo // hi is signed: sign-extends the sample
          i += 2
        }
        Some(AudioStats(fmt.getSampleRate.toInt, fmt.getChannels,
          data.length / 2, sum))
      } finally in.close()
    } catch {
      // UnsupportedAudioFileException, IOException, and any codec runtime
      // exception on corrupt bytes — all degrade to None, same as images.
      // (NonFatal never matches the non-local `return` control throwable.)
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Deterministic 16-bit mono PCM WAV: sample i =
    * ((seed·31 + i·7) mod 65536) − 32768 — a closed form a SQL oracle
    * reproduces with no audio library, so a real encode →
    * [[decodeAudio]] → sample-sum round trip is hash-checkable. Standard
    * 44-byte RIFF header, little-endian samples.
    */
  def synthesizeWav(seed: Long, nSamples: Int, sampleRate: Int = 8000): Array[Byte] = {
    require(nSamples > 0, "nSamples must be positive")
    val out = new Array[Short](nSamples)
    var i = 0
    while (i < nSamples) {
      out(i) = (java.lang.Math.floorMod(seed * 31 + i.toLong * 7, 65536L).toInt - 32768).toShort
      i += 1
    }
    writeWav16(out, sampleRate)
  }

  /** Standard 44-byte RIFF header + little-endian 16-bit mono PCM
    * samples — the byte layout [[decodeAudio]]/[[audioHash64]] round-trip.
    */
  private def writeWav16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataSize = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16) // block align, bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
    buf.array()
  }

  /** Deterministic PATTERN clip for perceptual audio-hash tests — the
    * audio analogue of [[synthesizePatternBmp]]: 64 frames of
    * `samplesPerFrame` CONSTANT samples each, frame `f`'s value
    * `((t²) div 32) mod 4096` with `t = 73·id + 31·f + 11` — the squared
    * term makes the frame-energy profile nonlinear in (id, f), so
    * distinct ids get near-independent hashes (the smooth
    * [[synthesizeWav]] ramp is perceptually degenerate: every frame's
    * mean is nearly identical). Values are non-negative (0..4095), so
    * energy (Σ|s|) equals the plain sample sum and the SQL oracle needs
    * no abs. `variant = 1` REFLECTS (4095 − v) exactly two seed-chosen
    * frames (`id mod 64` and `(7·id + 13) mod 64`) — a planted near twin
    * a few Hamming bits away. All closed forms, no 64-bit overflow for
    * any id below ~4·10⁷ (t² < 2⁶³).
    */
  def synthesizePatternWav(id: Long, variant: Int, samplesPerFrame: Int,
                           sampleRate: Int = 8000): Array[Byte] = {
    require(samplesPerFrame > 0, "samplesPerFrame must be positive")
    val f1 = java.lang.Math.floorMod(id, 64L).toInt
    val f2 = java.lang.Math.floorMod(7 * id + 13, 64L).toInt
    val n = 64 * samplesPerFrame
    val out = new Array[Short](n)
    var f = 0
    while (f < 64) {
      val t = 73L * id + 31L * f + 11L
      val v0 = ((t * t / 32L) % 4096L).toInt
      val v = if (variant == 1 && (f == f1 || f == f2)) 4095 - v0 else v0
      var i = 0
      while (i < samplesPerFrame) { out(f * samplesPerFrame + i) = v.toShort; i += 1 }
      f += 1
    }
    writeWav16(out, sampleRate)
  }

  /** 64-bit frame-energy hash from a REAL decode — the audio analogue of
    * [[aHash64]]: the clip's 16-bit PCM samples are reduced to 64
    * frame-energy sums (energy = Σ|sample| per frame; abs, because a
    * signed sum cancels to ~0 on any zero-mean waveform) and bit `f` is
    * set when frame `f`'s AVERAGE energy exceeds the whole-clip average —
    * compared cross-multiplied (`frameSum · totalSamples > totalSum ·
    * frameSamples`), so no division ever happens and any engine with
    * 64-bit integers reproduces the hash bit-for-bit. The 64-bit fast
    * path is exact to n ≈ 1.3·10⁸ samples (~4.7 h at 8 kHz): frameSum ≤
    * 32768·(n/64), so frameSum·n ≤ 512·n² < 2⁶³ ⇔ n < 2²⁷; past a
    * conservative 10⁸ the compare switches to BigInteger — same bits,
    * never a silent wrap. Perceptually-similar clips — re-encoded, slightly
    * trimmed, volume-shifted copies — agree on most bits; Hamming
    * distance over the hash is the near-dup signal, and
    * [[graft.operators.Dedup.simhashNearDupPairs]] consumes it
    * unchanged. None for undecodable payloads, non-16-bit-PCM encodings,
    * or clips shorter than 64 samples (no meaningful frame grid — the
    * audio analogue of aHash's 8×8 minimum).
    */
  def audioHash64(bytes: Array[Byte]): Option[Long] = {
    if (bytes == null || bytes.length < 12) return None
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16 ||
            fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
          return None
        val data = in.readAllBytes()
        val n = data.length / 2
        if (n < 64) return None
        val le = !fmt.isBigEndian
        val sums = new Array[Long](64)
        val cnt = new Array[Long](64)
        var i = 0
        while (i < n) {
          val lo = data(if (le) 2 * i else 2 * i + 1) & 0xFF
          val hi = data(if (le) 2 * i + 1 else 2 * i)
          val s = (hi << 8) | lo // hi is signed: sign-extends the sample
          val f = (i.toLong * 64 / n).toInt // same grid mapping as aHash64
          sums(f) += math.abs(s.toLong)
          cnt(f) += 1L
          i += 1
        }
        val total = sums.sum
        // 64-bit products are exact only to n < 2²⁷ (see scaladoc);
        // longer clips widen to BigInteger rather than silently wrap
        val wide = n > 100000000
        var hash = 0L
        var b = 0
        while (b < 64) {
          val bit =
            if (!wide) sums(b) * n > total * cnt(b)
            else java.math.BigInteger.valueOf(sums(b))
              .multiply(java.math.BigInteger.valueOf(n))
              .compareTo(java.math.BigInteger.valueOf(total)
                .multiply(java.math.BigInteger.valueOf(cnt(b)))) > 0
          if (bit) hash |= (1L << b)
          b += 1
        }
        Some(hash)
      } finally in.close()
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Partition-local [[audioHash64]] over a media column: (id, media) →
    * (id, audiohash). Undecodable payloads emit no row, exactly as
    * [[imageAHashes]]; nothing shuffles and downstream near-dup blocking
    * operates on the 8-byte hash, never the payload.
    */
  def audioHashes(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol), StructField("audiohash", LongType)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol), col("media.bytes").as("__b"))
      .mapPartitions { it =>
        it.flatMap { r =>
          audioHash64(r.getAs[Array[Byte]]("__b")).map(hv => Row(r.get(0), hv))
        }
      }
  }

  /** [[attachSyntheticAudio]] for [[synthesizePatternWav]]: pattern id
    * and variant flag come from columns — the planting knobs for
    * perceptual audio-dedup tests, mirroring [[attachPatternImages]].
    */
  def attachPatternAudio(df: DataFrame, idCol: String, patternCol: String,
                         variantCol: String, samplesPerFrame: Int,
                         sampleRate: Int = 8000): DataFrame = {
    val outSchema = StructType(Seq(df.schema(idCol), StructField("media", mediaType)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol), col(patternCol).cast("long"), col(variantCol).cast("int"))
      .mapPartitions { it =>
        it.map { r =>
          val bytes = synthesizePatternWav(r.getLong(1), r.getInt(2), samplesPerFrame,
            sampleRate)
          Row(r.get(0), Row(bytes, "audio/wav", null, null,
            64L * samplesPerFrame * 1000L / sampleRate))
        }
      }
  }

  /** Wrap each row's id as a synthesized WAV payload in the media
    * struct — the audio analogue of [[attachSyntheticImages]].
    */
  def attachSyntheticAudio(df: DataFrame, idCol: String, nSamples: Int,
                           sampleRate: Int = 8000): DataFrame = {
    val outSchema = StructType(Seq(df.schema(idCol), StructField("media", mediaType)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol)).mapPartitions { it =>
      it.map { r =>
        val seed = r.getAs[Number](0).longValue()
        Row(r.get(0), Row(synthesizeWav(seed, nSamples, sampleRate), "audio/wav",
          null, null, nSamples * 1000L / sampleRate))
      }
    }
  }

  /** Partition-local REAL audio decode: (id, media) → (id, sample_rate,
    * n_samples, sum_samples); undecodable payloads keep NULL stats.
    */
  def audioStats(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("sample_rate", IntegerType),
      StructField("n_samples", LongType), StructField("sum_samples", LongType)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol), col("media.bytes").as("__b"))
      .mapPartitions { it =>
        it.map { r =>
          decodeAudio(r.getAs[Array[Byte]]("__b")) match {
            case Some(a) => Row(r.get(0), a.sampleRate, a.nSamples, a.sumSamples)
            case None => Row(r.get(0), null, null, null)
          }
        }
      }
  }

  /** Wrap each row's id as a synthesized BMP payload in the media struct —
    * the image analogue of [[attachFakeMedia]], except the bytes are a
    * REAL encoded image that [[decodeImage]] round-trips. Narrow
    * mapPartitions; payload stays partition-local.
    */
  def attachSyntheticImages(df: DataFrame, idCol: String,
                            w: Int, h: Int): DataFrame = {
    val outSchema = StructType(Seq(df.schema(idCol), StructField("media", mediaType)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol)).mapPartitions { it =>
      it.map { r =>
        val seed = r.getAs[Number](0).longValue()
        Row(r.get(0), Row(synthesizeBmp(seed, w, h), "image/bmp", w, h, 0L))
      }
    }
  }

  /** [[attachSyntheticImages]] for [[synthesizePatternBmp]]: the pattern
    * id and the variant flag (0 = base, 1 = two-cell-reflected near
    * twin) come from columns — the planting knobs for perceptual-dedup
    * tests.
    */
  def attachPatternImages(df: DataFrame, idCol: String, patternCol: String,
                          variantCol: String, w: Int, h: Int): DataFrame = {
    val outSchema = StructType(Seq(df.schema(idCol), StructField("media", mediaType)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol), col(patternCol).cast("long"), col(variantCol).cast("int"))
      .mapPartitions { it =>
        it.map { r =>
          Row(r.get(0), Row(synthesizePatternBmp(r.getLong(1), r.getInt(2), w, h),
            "image/bmp", w, h, 0L))
        }
      }
  }

  /** 64-bit average-hash (aHash) from a REAL decode: the image is reduced
    * to an 8×8 grid of cell gray sums (gray = r+g+b — a sum, not an
    * average, so everything stays integer-exact) and bit (j·8 + i) is set
    * when cell (i, j)'s AVERAGE gray exceeds the whole-image average —
    * compared cross-multiplied (`cellSum · totalPixels > totalSum ·
    * cellPixels`), so no division ever happens and any engine with 64-bit
    * integers reproduces the hash bit-for-bit. Perceptually-similar
    * images agree on most bits; Hamming distance over the hash is the
    * standard near-dup signal for image corpora (the multimodal analogue
    * of [[graft.operators.Dedup.simhash]], and `simhashNearDupPairs`
    * consumes it unchanged). None for undecodable payloads or images
    * smaller than the 8×8 grid.
    */
  def aHash64(bytes: Array[Byte]): Option[Long] = {
    if (bytes == null || bytes.length < 8) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null || img.getWidth < 8 || img.getHeight < 8) return None
    val w = img.getWidth; val h = img.getHeight
    val sums = new Array[Long](64)
    val pix = new Array[Long](64)
    var y = 0
    while (y < h) {
      val j = y * 8 / h
      var x = 0
      while (x < w) {
        val i = x * 8 / w
        val p = img.getRGB(x, y)
        sums(j * 8 + i) += ((p >>> 16) & 0xFF) + ((p >>> 8) & 0xFF) + (p & 0xFF)
        pix(j * 8 + i) += 1L
        x += 1
      }
      y += 1
    }
    val total = sums.sum
    val totalPix = w.toLong * h
    var hash = 0L
    var b = 0
    while (b < 64) {
      if (sums(b) * totalPix > total * pix(b)) hash |= (1L << b)
      b += 1
    }
    Some(hash)
  }

  /** Partition-local aHash over a media column: (id, media) → (id,
    * ahash). Undecodable payloads emit no row (they have no perceptual
    * identity — an audit joins back against the id table to find them).
    * Nothing shuffles; downstream near-dup blocking operates on the
    * 8-byte hash, never the payload.
    */
  def imageAHashes(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol), StructField("ahash", LongType)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol), col("media.bytes").as("__b"))
      .mapPartitions { it =>
        it.flatMap { r =>
          aHash64(r.getAs[Array[Byte]]("__b")).map(hv => Row(r.get(0), hv))
        }
      }
  }

  /** Partition-local REAL image decode: (id, media) → (id, img_w, img_h,
    * sum_r, sum_g, sum_b). Rows whose payload does not decode are kept
    * with NULL stats (an audit query wants to see them, not lose them).
    * One iterator pass per partition; nothing shuffles.
    */
  def imageStats(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("img_w", IntegerType), StructField("img_h", IntegerType),
      StructField("sum_r", LongType), StructField("sum_g", LongType),
      StructField("sum_b", LongType)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol), col("media.bytes").as("__b"))
      .mapPartitions { it =>
        it.map { r =>
          decodeImage(r.getAs[Array[Byte]]("__b")) match {
            case Some(s) => Row(r.get(0), s.width, s.height, s.sumR, s.sumG, s.sumB)
            case None => Row(r.get(0), null, null, null, null, null)
          }
        }
      }
  }

  /** Deterministic integer box-filter downscale from a REAL decode: the
    * input grid must be an exact multiple of the output grid, each
    * output pixel is the floor-average of its (sx × sy) source block
    * per channel — PURE INTEGER arithmetic, so any engine replays the
    * resampling bit-for-bit (a float bilinear kernel could never be
    * oracle-checked) — and the result is re-encoded as a 24-bit BMP
    * through the same writer the synthetic corpus uses. None for
    * undecodable payloads or non-multiple dimensions (production
    * pipelines pad/crop to a multiple first; silently approximating
    * the grid would make the output layout-dependent). Resizing to the
    * input's own dimensions is the identity (1×1 blocks).
    */
  def resizeImage(bytes: Array[Byte], outW: Int, outH: Int): Option[Array[Byte]] = {
    require(outW > 0 && outH > 0, "output dims must be positive")
    if (bytes == null || bytes.length < 8) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null || img.getWidth % outW != 0 || img.getHeight % outH != 0)
      return None
    val sx = img.getWidth / outW
    val sy = img.getHeight / outH
    val n = sx.toLong * sy
    val out = new Array[Int](outW * outH * 3)
    var v = 0
    while (v < outH) {
      var u = 0
      while (u < outW) {
        var sr = 0L; var sg = 0L; var sb = 0L
        var dy = 0
        while (dy < sy) {
          var dx = 0
          while (dx < sx) {
            val p = img.getRGB(u * sx + dx, v * sy + dy)
            sr += (p >>> 16) & 0xFF
            sg += (p >>> 8) & 0xFF
            sb += p & 0xFF
            dx += 1
          }
          dy += 1
        }
        val o = (v * outW + u) * 3
        out(o) = (sr / n).toInt; out(o + 1) = (sg / n).toInt; out(o + 2) = (sb / n).toInt
        u += 1
      }
      v += 1
    }
    Some(writeBmp24(outW, outH) { (x, y) =>
      val o = (y * outW + x) * 3
      (out(o), out(o + 1), out(o + 2))
    })
  }

  /** The resize round trip, partition-local: (id, media) → decode →
    * [[resizeImage]] box-filter downscale → re-encode → decode AGAIN →
    * (id, out_w, out_h, sum_r, sum_g, sum_b) of the RESIZED image. Rows
    * whose payload fails any stage keep NULL stats. Nothing shuffles;
    * payload bytes never leave the partition — the shape a thumbnail /
    * vision-preprocessing pass has at 100 TB.
    */
  def resizedImageStats(df: DataFrame, idCol: String,
                        outW: Int, outH: Int): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("out_w", IntegerType), StructField("out_h", IntegerType),
      StructField("sum_r", LongType), StructField("sum_g", LongType),
      StructField("sum_b", LongType)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol), col("media.bytes").as("__b"))
      .mapPartitions { it =>
        it.map { r =>
          resizeImage(r.getAs[Array[Byte]]("__b"), outW, outH)
            .flatMap(decodeImage) match {
            case Some(s) => Row(r.get(0), s.width, s.height, s.sumR, s.sumG, s.sumB)
            case None => Row(r.get(0), null, null, null, null, null)
          }
        }
      }
  }

  /** Partition-local decode + feature extraction: (id, media) →
    * (id, byte_len, features ARRAY<FLOAT>). Image payloads (mime
    * starting with `image/`) go through the REAL [[decodeImage]] path — features are
    * dimensions + mean channels; everything else gets
    * [[byteHashFeatures]]. Batch shape: one iterator pass per partition,
    * no per-row task overhead, nothing shuffles.
    */
  def extractFeatures(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("byte_len", LongType),
      StructField("features", ArrayType(FloatType))))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol), col("media.bytes").as("__b"), col("media.mime").as("__m"))
      .mapPartitions { it =>
        it.map { r =>
          val bytes = r.getAs[Array[Byte]]("__b")
          val mime = r.getAs[String]("__m")
          if (bytes == null) Row(r.get(0), 0L, null) // missing payload → null features
          else {
            val feats = (if (mime != null && mime.startsWith("image/"))
              decodeImage(bytes) else None) match {
              case Some(s) =>
                val n = s.width.toLong * s.height
                Array(s.width.toFloat, s.height.toFloat,
                  (s.sumR.toDouble / n).toFloat, (s.sumG.toDouble / n).toFloat,
                  (s.sumB.toDouble / n).toFloat,
                  ((0.299 * s.sumR + 0.587 * s.sumG + 0.114 * s.sumB) / n).toFloat,
                  bytes.length.toFloat, 1f)
              case None => byteHashFeatures(bytes)
            }
            Row(r.get(0), bytes.length.toLong, feats)
          }
        }
      }
  }

  /** Frame sampling stub for video payloads: n evenly-spaced "frames"
    * (byte slices) per record — the real version would seek keyframes.
    */
  def sampleFrames(df: DataFrame, idCol: String, n: Int): DataFrame =
    df.select(col(idCol), posexplode(
      transform(sequence(lit(0), lit(n - 1)), i =>
        substring(col("media.bytes"),
          (i * greatest(floor(octet_length(col("media.bytes")) / lit(n)).cast("long"),
            lit(1L)) + 1).cast("int"),
          lit(16))))
      .as(Seq("frame_idx", "frame_bytes")))
}
