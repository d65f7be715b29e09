package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Order statistics + skew-safe aggregation.
  *
  * The reference normalises scores with PERCENT_RANK (see ImpactScore);
  * the engine-grade generalisations here are exact discrete quantiles and
  * the two-stage salted aggregate for skewed keys.
  */
object Stats {

  /** Exact discrete quantiles per group: value at rank ceil(q*n)
    * (percentile_disc semantics — picks an actual data value, so results
    * are engine-portable; interpolating percentiles differ across engines
    * in float arithmetic). One shuffle + per-partition sort. */
  def quantileDisc(df: DataFrame, keys: Seq[String], valueCol: String,
                   qs: Seq[Double]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(valueCol))
    val ranked = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(keys.map(col): _*)))
    val aggs = qs.map { q =>
      max(when(col("__rn") === ceil(lit(q) * col("__n")), col(valueCol)))
        .as(s"p${(q * 100).round}")
    }
    ranked.groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail ++ Seq(
        count(lit(1)).as("n"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v")): _*)
  }

  /** Two-stage salted aggregation for skewed group keys: stage 1 groups on
    * (key, salt) spreading a hot key over `salts` reducers (map-side
    * partial agg still applies), stage 2 merges the partials. Results are
    * identical to a direct groupBy — only the shuffle shape changes.
    * Salt must be deterministic per row (not rand()) so retries/oracles
    * agree. */
  def saltedAgg(df: DataFrame, key: String, saltSrc: Column, salts: Int,
                sums: Seq[(String, Column)]): DataFrame = {
    val stage1 = df
      .withColumn("__salt", pmod(saltSrc, lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__cnt"),
        sums.map { case (n, c) => sum(c).as(s"__s_$n") }: _*)
    stage1.groupBy(col(key))
      .agg(sum("__cnt").as("n_rows"),
        sums.map { case (n, _) => sum(s"__s_$n").as(n) }: _*)
  }
}
