package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: images/audio/video ride as opaque `BINARY`
  * columns with a typed metadata struct; decode / feature-extraction /
  * frame-sampling run as partition-local batch operators.
  *
  * The Spark side — schema, partition shape, operator signatures, batch
  * iteration — is real and tested. The actual media decoding is STUBBED
  * (`decodeStub`): the container has no image/audio codecs, so the decoder
  * derives deterministic fake features from the bytes. Swapping in a real
  * decoder changes only the function body, not the pipeline shape.
  *
  * Scale notes: media payloads never shuffle — every operator here is a
  * narrow `mapPartitions`; feature vectors (small) are what downstream
  * joins/aggregations move. Partition sizing for 100 TB of media comes
  * from `spark.sql.files.maxPartitionBytes` at the binary-file source.
  */
object Multimodal {

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

  /** STUB decoder: deterministic fake feature vector from the payload
    * bytes. A real implementation would decode pixels/samples here; the
    * signature (bytes → fixed-dim Array[Float]) and the partition-local
    * batch loop around it are the real contract.
    */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    // ??? real decoder goes here — deterministic fake derived from the
    // engine's rolling hash (single source of truth for the byte loop)
    val h = graft.functions.RollingHash.hashBytes(bytes)
    Array.tabulate(featureDim) { d =>
      val v = (h ^ (h >>> (d + 1))) * 0x9E3779B97F4A7C15L
      ((v >>> 40).toFloat / (1 << 24).toFloat) - 0.5f
    }
  }

  /** Partition-local decode + feature extraction: (id, media) →
    * (id, byte_len, features ARRAY<FLOAT>). Batch shape: one iterator
    * pass per partition, no per-row task overhead, nothing shuffles.
    */
  def extractFeatures(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("byte_len", LongType),
      StructField("features", ArrayType(FloatType))))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol), col("media.bytes").as("__b"))
      .mapPartitions { it =>
        it.map { r =>
          val bytes = r.getAs[Array[Byte]]("__b")
          if (bytes == null) Row(r.get(0), 0L, null) // missing payload → null features
          else Row(r.get(0), bytes.length.toLong, decodeStub(bytes))
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
