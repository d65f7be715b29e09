package graft

class SparkEntrySpec extends SparkSpec {

  test("entry (driver smoke contract) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("rows-only queries are exactly the documented set") {
    // q_profile_customer gained a full oracle in round 9 (the HLL estimate
    // is checked in-engine and exported as a stable boolean); only the
    // stub-codec decode remains inherently oracle-free
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly === Set("q_multimodal_decode"))
  }

  test("all queries run and return rows on sf0.001") {
    val empty = SparkEntry.queries.flatMap { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      if (n == 0) Some(name) else None
    }
    // every query should produce at least one row at the smallest SF
    assert(empty.isEmpty, s"queries with empty results: $empty")
  }
}
