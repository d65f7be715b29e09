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

  test("frameSample emits every k-th fixed-size frame, drops the partial tail") {
    import org.apache.spark.sql.functions.col
    // payload: frames of 4 bytes: "AAAA","BBBB","CCCC","DDDD" + "EE" tail
    val df = Seq((7L, "AAAABBBBCCCCDDDDEE")).toDF("id", "payload")
    val out = DecodeStub.frameSample(df, "id", "payload", frameBytes = 4, every = 2)
      .select(col("frame_idx"), col("frame").cast("string"))
      .as[(Int, String)].collect().toSeq.sortBy(_._1)
    assert(out === Seq((0, "AAAA"), (2, "CCCC")))
    // payload shorter than one frame -> no rows
    val none = DecodeStub.frameSample(Seq((8L, "xy")).toDF("id", "payload"),
      "id", "payload", frameBytes = 4, every = 1)
    assert(none.count() === 0)
  }

  test("payloadMeta extracts byte length + hash declaratively") {
    val df = Seq((1L, "abc")).toDF("id", "payload")
    val row = DecodeStub.payloadMeta(df, "id", "payload", "text").head()
    assert(row.getAs[Int]("n_bytes") === 3)
    assert(row.getAs[String]("content_md5") === "900150983cd24fb0d6963f7d28e17f72")
  }
}
