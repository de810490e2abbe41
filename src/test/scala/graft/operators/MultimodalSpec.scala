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

  test("sampleFrames emits n frames with in-range offsets") {
    val frames = Multimodal.sampleFrames(mediaDf, "doc_id", 4)
      .filter(col("doc_id") === 1).orderBy("frame_idx").collect()
    assert(frames.length == 4)
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3))
    val f = frames.map(_.getAs[Array[Byte]]("frame_bytes"))
    assert(f.forall(b => b.length > 0 && b.length <= 16))
  }
}
