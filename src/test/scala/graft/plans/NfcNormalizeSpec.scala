package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val composed = "caf" + 'é'   // e-acute as one code point
  private val decomposed = "cafe" + '́' // e + combining acute

  test("composed and decomposed forms normalize to the same NFC string") {
    val df = Seq((1L, composed), (2L, decomposed), (3L, "plain ascii"),
      (4L, null.asInstanceOf[String])).toDF("id", "t")
    val out = df.select(col("id"), NfcNormalize.nfcNormalize(col("t")).as("n"))
      .as[(Long, Option[String])].collect().toMap
    assert(out(1L) === Some(composed))
    assert(out(2L) === Some(composed), "decomposed input must compose under NFC")
    assert(out(3L) === Some("plain ascii")) // ASCII fast path is identity
    assert(out(4L) === None)                // null-safe

    // interpreted path (count_distinct forces eval off codegen) agrees
    val interp = df.where(col("id") <= 2)
      .select(count_distinct(NfcNormalize.nfcNormalize(col("t"))))
      .head().getLong(0)
    assert(interp === 1L)
  }

  test("graft_nfc is callable from SQL via GraftExtensions") {
    val r = spark
      .sql(s"SELECT graft_nfc('$decomposed') = '$composed'")
      .head().getBoolean(0)
    assert(r)
  }

  test("canonicalize: NFC + lower + non-alnum collapse, accent spellings converge") {
    import graft.functions.Text
    val df = Seq(
      (1L, s"  ${composed.capitalize}-Bar!! 42 "),
      (2L, s"$decomposed   bar 42"),
      (3L, "The Quick,Brown;Fox")
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), Text.canonicalize(col("text")).as("c"))
      .as[(Long, String)].collect().toMap
    // e-acute is non-[a-z0-9] after NFC -> both spellings canonicalize the
    // same way ("caf bar 42"), composed or decomposed on input
    assert(out(1L) === out(2L))
    assert(out(1L) === "caf bar 42")
    assert(out(3L) === "the quick brown fox")
  }
}
