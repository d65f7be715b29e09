package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operators distilled from the reference's dbt models.
  *
  * All of these are declarative DataFrame compositions: Catalyst keeps
  * pushdown/pruning, and each op costs at most one shuffle on its key.
  */
object Relational {

  /** `SELECT DISTINCT ON (keys) ... ORDER BY keys, ord` — first row per key.
    *
    * Reference: dbt models/london_overview/in_progress_list_london.sql:8 and
    * wellbeing_overview/stg_emergency_works_by_authority.sql:10 use DuckDB's
    * DISTINCT ON to keep one permit row per permit_reference_number.
    *
    * Spark-first: row_number over a window partitioned by the keys — a single
    * hash shuffle on the dedup key, streaming rank (no full materialization),
    * AQE handles key skew at scale.
    */
  def distinctOn(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Top-k rows per group by `order` (rank window, deterministic ties via
    * the caller's tie-break columns). */
  def topKPerGroup(df: DataFrame, keys: Seq[String], order: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("rank_in_group", row_number().over(w))
      .where(col("rank_in_group") <= k)
  }

  /** `key NOT IN (SELECT key FROM excluded WHERE ...)` — anti-join exclusion.
    *
    * Reference: in_progress_list_london.sql:81-87 excludes permits that later
    * reached `completed`/WORK_STOP. NOT IN with a correlated subquery becomes
    * a `left_anti` join: one shuffle (or broadcast when the exclusion set is
    * small), never a driver-side collect.
    */
  def antiJoinOnKey(df: DataFrame, excluded: DataFrame, key: String): DataFrame =
    df.join(excluded.select(col(key)).distinct(), Seq(key), "left_anti")

  /** UNION ALL of homogeneous slices then per-key dedup (reference:
    * stg_emergency_works_by_authority.sql:103-108 unions completed +
    * in-progress emergency works). */
  def unionDedup(slices: Seq[DataFrame], keys: Seq[String], order: Seq[Column]): DataFrame =
    distinctOn(slices.reduce(_.unionByName(_)), keys, order)
}
