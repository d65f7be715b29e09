package graft.operators

import graft.SparkSpec

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, "O", "x"), (1L, "F", "y"), (2L, "O", null), (3L, "Z", "z")
  ).toDF("k", "status", "val")

  test("duplicateKeys finds keys with >1 row") {
    val d = DataQuality.duplicateKeys(df, Seq("k")).select("k").as[Long].collect()
    assert(d.toSeq === Seq(1L))
  }

  test("overlappingKeys finds keys in both slices") {
    import org.apache.spark.sql.functions.col
    val o = DataQuality.overlappingKeys(
      df.where(col("status") === "O"), df.where(col("status") === "F"), "k")
    assert(o.as[Long].collect().toSeq === Seq(1L))
  }

  test("suite emits one summary row per rule") {
    val s = DataQuality.suite(Seq(
      "nulls" -> DataQuality.notNullViolations(df, "val"),
      "accepted" -> DataQuality.acceptedValuesViolations(df, "status", Seq("O", "F"))))
      .as[(String, Long)].collect().toMap
    assert(s === Map("nulls" -> 1L, "accepted" -> 1L))
  }
}
