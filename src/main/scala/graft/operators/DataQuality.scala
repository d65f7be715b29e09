package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the reference ships these as dbt
  * data tests and schema tests:
  *  - dbt data_tests/assert_no_duplicate_permits_between_progress_and_completed_london.sql
  *    (no key appears in both slices)
  *  - models/london_overview/test_impact_scores_london.yml (not_null,
  *    accepted_values)
  *
  * Each check returns a violations DataFrame (empty == pass) so suites
  * compose with unionByName; everything is aggregation-shaped (one
  * shuffle per check, map-side partial agg).
  */
object DataQuality {

  /** Keys appearing more than once. */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .where(col("n_rows") > 1)

  /** Keys present in BOTH frames (the reference's no-duplicate-between-
    * progress-and-completed assertion). */
  def overlappingKeys(a: DataFrame, b: DataFrame, key: String): DataFrame =
    a.select(col(key)).distinct()
      .join(b.select(col(key)).distinct(), Seq(key), "inner")

  /** Rows where `c` is null. */
  def notNullViolations(df: DataFrame, c: String): DataFrame =
    df.where(col(c).isNull)

  /** Rows whose `c` is outside the accepted set. */
  def acceptedValuesViolations(df: DataFrame, c: String, accepted: Seq[String]): DataFrame =
    df.where(!col(c).isin(accepted.map(lit): _*) || col(c).isNull)

  /** Keys present in both slices of the SAME table — one groupBy with two
    * conditional counts: single scan + single shuffle, replacing the
    * two-filtered-scans + distinct + join formulation (which reads the
    * fact table twice at 100 TB). */
  def overlappingKeysWithin(df: DataFrame, key: String,
                            inA: Column, inB: Column): DataFrame =
    // NULL keys excluded: groupBy treats nulls as one group, so a null
    // key in both slices would be reported as an overlap — the equi-join
    // form this replaces (and the mirrored dbt test) drops nulls
    df.where(col(key).isNotNull)
      .groupBy(col(key))
      .agg(count(when(inA, 1)).as("__n_a"), count(when(inB, 1)).as("__n_b"))
      .where(col("__n_a") > 0 && col("__n_b") > 0)
      .select(col(key))

  /** Fuse scan-level predicate checks (not_null, accepted_values, range,
    * ...) into ONE aggregation over ONE scan — `count(when(pred))` per rule
    * unpivoted to (rule, n_violations) rows. N checks cost one pass, not N. */
  def scalarSuite(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty,
      "scalarSuite needs at least one check (a config that filtered to " +
        "zero rules would otherwise fail with a bare head-of-empty-list)")
    // positional aliases + typed struct/explode unpivot: rule names are
    // emitted only as string LITERALS, never parsed as SQL, so quotes /
    // backticks / any characters in them are safe
    val aggs = checks.zipWithIndex.map { case ((_, pred), i) =>
      count(when(pred, 1)).as(s"__c$i") }
    val pairs = checks.zipWithIndex.map { case ((rule, _), i) =>
      struct(lit(rule).as("rule"), col(s"__c$i").as("n_violations")) }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(pairs: _*)).as("kv"))
      .select(col("kv.rule").as("rule"), col("kv.n_violations").as("n_violations"))
  }

  /** Run a named suite of checks, one summary row per rule. */
  def suite(checks: Seq[(String, DataFrame)]): DataFrame = {
    require(checks.nonEmpty, "suite needs at least one check")
    checks.map { case (rule, viol) =>
      viol.agg(count(lit(1)).as("n_violations"))
        .select(lit(rule).as("rule"), col("n_violations"))
    }.reduce(_.unionByName(_))
  }
}
