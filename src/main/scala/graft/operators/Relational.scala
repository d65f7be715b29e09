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
    // collision-checked rank alias: withColumn REPLACES an existing
    // column, so a caller schema that legitimately contains "__rn"
    // would silently lose that field through the drop below
    // case-INSENSITIVE check: withColumn/drop resolve names
    // case-insensitively under the default spark.sql.caseSensitive=false
    val rn = Iterator.iterate("__rn")(_ + "_")
      .find(n => !df.columns.exists(_.equalsIgnoreCase(n))).get
    df.withColumn(rn, row_number().over(w))
      .where(col(rn) === 1)
      .drop(rn)
  }

  /** Top-k rows per group by `order` (rank window, deterministic ties via
    * the caller's tie-break columns). `rank_in_group` is part of the
    * OUTPUT contract, so unlike [[distinctOn]]'s hidden rank it cannot be
    * collision-renamed — an input already carrying that name would be
    * silently overwritten (withColumn REPLACES); refuse it loudly. */
  def topKPerGroup(df: DataFrame, keys: Seq[String], order: Seq[Column], k: Int): DataFrame = {
    require(!df.columns.exists(_.equalsIgnoreCase("rank_in_group")),
      "topKPerGroup emits 'rank_in_group' and the input already has that " +
        "column — rename it first or it would be silently replaced")
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
    *
    * NULL semantics are NOT EXISTS's, not NOT IN's: a NULL key in
    * `excluded` does not blank the whole result (SQL NOT IN would
    * return zero rows), and NULL-keyed `df` rows are kept. That is the
    * useful behavior for exclusion lists; use a real NOT IN subquery if
    * three-valued-logic semantics are required.
    */
  def antiJoinOnKey(df: DataFrame, excluded: DataFrame, key: String): DataFrame =
    df.join(excluded.select(col(key)).distinct(), Seq(key), "left_anti")

  /** UNION ALL of homogeneous slices then per-key dedup (reference:
    * stg_emergency_works_by_authority.sql:103-108 unions completed +
    * in-progress emergency works). */
  def unionDedup(slices: Seq[DataFrame], keys: Seq[String], order: Seq[Column]): DataFrame =
    distinctOn(slices.reduce(_.unionByName(_)), keys, order)

  /** SCD-type-2 apply (the dbt-snapshot / warehouse MERGE shape): merge a
    * change log into a dimension's OPEN rows, producing the full type-2
    * validity history — no-op updates (attributes identical to the
    * previous version) are dropped, real changes close the prior version
    * at the change time, brand-new keys open their first version.
    *
    * `openRows` carries one current row per key with `tsCol` = its
    * valid_from; `changes` is the update log (key, attrs, ts). Output:
    * (keys, attrs, valid_from, valid_to) with valid_to NULL on the open
    * version. Already-closed history rows are untouched by definition —
    * union them back unchanged.
    *
    * Scale shape: one hash shuffle on the key; both window passes (no-op
    * drop via lag, interval close via lead) share the per-key sort.
    * Deterministic given unique `tsCol` per key (pass a composed
    * timestamp+seq column otherwise). */
  def scd2Apply(openRows: DataFrame, changes: DataFrame, keyCols: Seq[String],
                attrCols: Seq[String], tsCol: String): DataFrame = {
    val cols = (keyCols ++ attrCols :+ tsCol).map(col)
    val events = openRows.select(cols: _*)
      .unionByName(changes.select(cols: _*))
    val kw = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol))
    val attrStruct = struct(attrCols.map(col): _*)
    val changed = events
      .withColumn("__prev", lag(attrStruct, 1).over(kw))
      .where(col("__prev").isNull || !(col("__prev") <=> attrStruct))
    changed
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(kw))
      .select((keyCols ++ attrCols).map(col)
        :+ col("valid_from") :+ col("valid_to"): _*)
  }
}
