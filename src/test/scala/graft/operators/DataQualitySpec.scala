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

  test("overlappingKeysWithin == two-slice join formulation, single scan") {
    import org.apache.spark.sql.functions.col
    val fused = DataQuality.overlappingKeysWithin(df, "k",
      col("status") === "O", col("status") === "F").as[Long].collect().toSeq
    assert(fused === Seq(1L))
  }

  test("scalarSuite fuses N predicate checks into one pass with same counts") {
    import org.apache.spark.sql.functions.col
    val s = DataQuality.scalarSuite(df, Seq(
      "nulls" -> col("val").isNull,
      "accepted" -> (!col("status").isin("O", "F") || col("status").isNull)))
      .as[(String, Long)].collect().toMap
    assert(s === Map("nulls" -> 1L, "accepted" -> 1L))
    // one aggregation: the plan contains exactly one scan of the input
    val plan = DataQuality.scalarSuite(df, Seq(
      "nulls" -> col("val").isNull,
      "accepted" -> (!col("status").isin("O", "F") || col("status").isNull)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Union"))
  }

  test("suite emits one summary row per rule") {
    val s = DataQuality.suite(Seq(
      "nulls" -> DataQuality.notNullViolations(df, "val"),
      "accepted" -> DataQuality.acceptedValuesViolations(df, "status", Seq("O", "F"))))
      .as[(String, Long)].collect().toMap
    assert(s === Map("nulls" -> 1L, "accepted" -> 1L))
  }
}
