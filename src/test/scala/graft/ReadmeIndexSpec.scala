package graft

import org.scalatest.funsuite.AnyFunSuite

/** Drift guard for the generated README operator index
  * (tools/gen_readme_index.py over SURVEY.md §2): every driver query in
  * [[SparkEntry.queries]] must appear as an index row, every `q_*` index
  * row must still be a registered query (no stale rows), and every
  * oracle entry must gate a registered query. A failure here means the
  * code and the documented inventory diverged — regenerate with
  * `python3 tools/gen_readme_index.py` (and fix SURVEY §2 if the row
  * itself is missing). */
class ReadmeIndexSpec extends AnyFunSuite {

  private def indexRows: Seq[String] = {
    val readme = scala.io.Source.fromFile("README.md", "UTF-8")
    val all = try readme.mkString finally readme.close()
    val block = all.split("<!-- OPERATOR-INDEX:BEGIN").lift(1)
      .flatMap(_.split("<!-- OPERATOR-INDEX:END -->").headOption)
      .getOrElse(fail("README.md has no OPERATOR-INDEX block — run " +
        "tools/gen_readme_index.py"))
    "\\| `([^`]+)` \\|".r.findAllMatchIn(block).map(_.group(1)).toSeq
  }

  test("every SparkEntry query appears in the README operator index") {
    val names = indexRows.toSet
    val missing = SparkEntry.queries.keySet -- names
    assert(missing.isEmpty,
      s"queries missing from README's operator index (run tools/" +
        s"gen_readme_index.py after adding the SURVEY §2 row): " +
        s"${missing.toSeq.sorted.mkString(", ")}")
  }

  test("every q_* index row is a registered query (no stale rows)") {
    val stale = indexRows.filter(_.startsWith("q_")).toSet --
      SparkEntry.queries.keySet
    assert(stale.isEmpty,
      s"README index rows with no SparkEntry.queries entry: " +
        s"${stale.toSeq.sorted.mkString(", ")}")
  }

  test("index rows are unique and every oracle gates a registered query") {
    val rows = indexRows
    assert(rows.distinct.size == rows.size,
      s"duplicate index rows: ${rows.diff(rows.distinct).mkString(", ")}")
    val orphanOracles = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphanOracles.isEmpty,
      s"oracleSql entries with no query: ${orphanOracles.mkString(", ")}")
  }
}
