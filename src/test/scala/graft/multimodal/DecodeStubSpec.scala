package graft.multimodal

import graft.SparkSpec

class DecodeStubSpec extends SparkSpec {
  import spark.implicits._

  test("decodeFeatures runs partition-batched and is deterministic") {
    val media = Seq(
      DecodeStub.MediaRow(1L, "image", Array[Byte](1, 2, 3, 4)),
      DecodeStub.MediaRow(2L, "audio", Array[Byte](5, 6))
    ).toDS()
    val out = DecodeStub.decodeFeatures(media).collect().map(r => r.media_id -> r).toMap
    assert(out(1L).n_bytes === 4)
    assert(out(1L).feature.length === DecodeStub.FeatureDim)
    assert(out(1L).content_md5.length === 32)
    val again = DecodeStub.decodeFeatures(media).collect().map(r => r.media_id -> r).toMap
    assert(out(1L).feature.toSeq === again(1L).feature.toSeq)
  }

  test("payloadMeta extracts byte length + hash declaratively") {
    val df = Seq((1L, "abc")).toDF("id", "payload")
    val row = DecodeStub.payloadMeta(df, "id", "payload", "text").head()
    assert(row.getAs[Int]("n_bytes") === 3)
    assert(row.getAs[String]("content_md5") === "900150983cd24fb0d6963f7d28e17f72")
  }
}
