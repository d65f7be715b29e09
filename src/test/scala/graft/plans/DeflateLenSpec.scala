package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DeflateLenSpec extends SparkSpec {
  import spark.implicits._

  test("expression matches a reference Deflater pass, codegen and interpreted") {
    val texts = Seq("hello world", "a" * 500, "", "mixed 123 üé")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val out = df.select(col("id"), DeflateLen.deflateLen(col("text")).as("n"))
      .as[(Long, Int)].collect().toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(out(i.toLong) === DeflateLen.deflatedLength(t.getBytes("UTF-8")),
        s"row $i diverged from the reference pass")
    }
    // interpreted path (eval without codegen) agrees
    val interp = df.where(col("id") >= 0).select(
        sum(DeflateLen.deflateLen(col("text")).cast("long"))).head().getLong(0)
    assert(interp === out.values.map(_.toLong).sum)
  }

  test("graft_deflate_len is callable from SQL via GraftExtensions") {
    val n = spark.sql("SELECT graft_deflate_len('hello world hello world')")
      .head().getInt(0)
    assert(n === DeflateLen.deflatedLength(
      "hello world hello world".getBytes("UTF-8")))
  }

  test("compressionRatioPpm: repetition compresses far below natural prose") {
    import graft.functions.Text
    val df = Seq(
      (1L, "spam " * 200),
      (2L, "The quick brown fox jumps over the lazy dog while seventeen " +
        "astronauts debate quantum economics in a basement near Helsinki."),
      (3L, "")
    ).toDF("doc_id", "text")
    val r = df.select(col("doc_id"), Text.compressionRatioPpm(col("text")).as("r"))
      .as[(Long, Long)].collect().toMap
    assert(r(1L) < 100000L, s"repetitive text ratio ${r(1L)} should be tiny")
    assert(r(2L) > 500000L, s"diverse prose ratio ${r(2L)} should stay high")
    assert(r(3L) === 1000000L) // empty text is neutral
    // deterministic on re-run
    val again = df.select(col("doc_id"), Text.compressionRatioPpm(col("text")).as("r"))
      .as[(Long, Long)].collect().toMap
    assert(r === again)
  }
}
