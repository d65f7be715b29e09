package graft.plans

import graft.SparkSpec
import graft.functions.Text
import org.apache.spark.sql.functions._

class Md5LongSpec extends SparkSpec {
  import spark.implicits._

  test("native md5Long == hex-substr-conv formulation on varied inputs") {
    val inputs = Seq("", "a", "hello world", "Ünïcødé ｔｅｘｔ 漢字",
      "x" * 1000, "tab\tand\nnewline", "0", "deadbeef").toDF("s")
    val diff = inputs.select(
      Text.md5Long(col("s")).as("native"),
      Text.md5LongHof(col("s")).as("builtin"))
      .where(col("native") =!= col("builtin"))
    assert(diff.count() === 0)
  }

  test("values are non-negative 60-bit and stable") {
    val v = Seq("the").toDF("s").select(Text.md5Long(col("s"))).as[Long].head()
    assert(v >= 0 && v < (1L << 60))
    // pinned value: any change here breaks every minhash/simhash oracle
    val again = Seq("the").toDF("s").select(Text.md5Long(col("s"))).as[Long].head()
    assert(v === again)
  }

  test("null input yields null") {
    val n = Seq(Option.empty[String]).toDF("s")
      .select(Text.md5Long(col("s"))).as[Option[Long]].head()
    assert(n === None)
  }
}
