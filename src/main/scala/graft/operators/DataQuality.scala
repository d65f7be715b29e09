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

  /** Run a named suite of checks, one summary row per rule. */
  def suite(checks: Seq[(String, DataFrame)]): DataFrame =
    checks.map { case (rule, viol) =>
      viol.agg(count(lit(1)).as("n_violations"))
        .select(lit(rule).as("rule"), col("n_violations"))
    }.reduce(_.unionByName(_))
}
