package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, NumericType, StringType}

/** Dataset profiling: one summary row per column — the engine-grade form
  * of the eyeball checks the reference does when landing a new source
  * (row counts in metadata_logger, validate_column_names, ad-hoc SELECTs).
  *
  * Single pass over the data: all per-column aggregates run in ONE
  * aggregation (no per-column jobs); distinct counts use HLL sketches
  * (approx_count_distinct) so the pass stays shuffle-light at 100 TB.
  */
object Profile {

  /** HLL-sketch profile — the 100 TB default (shuffle-light). */
  def profile(df: DataFrame): DataFrame = profileImpl(df, exact = false)

  /** Exact-distinct variant: same single-pass shape with `countDistinct`
    * (expand-based, heavier — for small/medium data or when the counts
    * feed a correctness gate; being exact, it is DuckDB-oracle-checkable,
    * which is how the driver verifies the profile machinery). */
  def profileExact(df: DataFrame): DataFrame = profileImpl(df, exact = true)

  private def profileImpl(df: DataFrame, exact: Boolean): DataFrame = {
    val cols = df.schema.fields
    // df(name) resolves the name LITERALLY; col("price.usd") would parse
    // the dot as struct access and fail — and profiling runs on raw
    // landed sources BEFORE ColumnNormalizer, where such names live.
    // Derived aliases are positional for the same reason.
    val aggs = cols.zipWithIndex.flatMap { case (f, i) =>
      val c = df(f.name)
      val distinctAgg = f.dataType match {
        // countDistinct/approx_count_distinct reject MapType: skip the
        // metric for that column instead of failing the whole profile
        case _: MapType => lit(null).cast("long")
        case _ => if (exact) countDistinct(c) else approx_count_distinct(c)
      }
      Seq(
        count(c).as(s"__nn_$i"),
        distinctAgg.as(s"__ad_$i")) ++
        (f.dataType match {
          case _: NumericType => Seq(
            min(c).cast("double").as(s"__mn_$i"),
            max(c).cast("double").as(s"__mx_$i"))
          case StringType => Seq(
            min(length(c)).cast("double").as(s"__mn_$i"),
            max(length(c)).cast("double").as(s"__mx_$i"))
          case _ => Seq(
            lit(null).cast("double").as(s"__mn_$i"),
            lit(null).cast("double").as(s"__mx_$i"))
        })
    }
    val total = df.agg(count(lit(1)).as("__total"), aggs: _*)
    val perCol = cols.zipWithIndex.map { case (f, i) =>
      struct(
        lit(f.name).as("column"),
        lit(f.dataType.simpleString).as("dtype"),
        col("__total").as("n_rows"),
        (col("__total") - col(s"__nn_$i")).as("n_nulls"),
        col(s"__ad_$i").as(if (exact) "n_distinct" else "approx_distinct"),
        col(s"__mn_$i").as("min_or_minlen"),
        col(s"__mx_$i").as("max_or_maxlen"))
    }
    total.select(explode(array(perCol: _*)).as("p")).select("p.*")
  }
}
