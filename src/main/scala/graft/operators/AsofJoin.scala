package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each left event the most recent right event at or
  * before it, per key. Spark has no native as-of join; the naive form is an
  * inequality join (BNL at scale).
  *
  * Spark-first plan: tag both streams, UNION, sort per key by time, and
  * carry the latest right-side value forward with
  * `last(..., ignoreNulls) OVER (ROWS UNBOUNDED PRECEDING)` — a single
  * hash shuffle on the key + one per-partition sort, linear in the data.
  * This is the standard union-scan formulation (cf. pandas merge_asof /
  * QuestDB ASOF JOIN semantics) expressed in plain window functions.
  */
object AsofJoin {

  /** Directed, tolerance-bounded as-of join — the full pandas
    * `merge_asof(direction=, tolerance=)` surface. Same single-shuffle
    * union-scan plan as [[asofJoin]]; `forward` just reverses the scan
    * order, and the tolerance NULLs the match out (pandas semantics: the
    * left row survives unmatched) instead of dropping the row — both are
    * per-row expressions on top of the window, so the plan shape is
    * unchanged. Ties on (key, ts) between right rows break
    * deterministically on the value: backward keeps the max value among
    * the latest ts, forward the min among the earliest — pinned so the
    * result is reproducible across retries and engines. */
  def asofJoinDir(left: DataFrame, right: DataFrame, keyCol: String,
                  tsCol: String, valCol: String,
                  direction: String = "backward",
                  tolerance: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"unknown direction $direction")
    val backward = direction == "backward"
    val l = left.withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(right.schema(valCol).dataType))
      .withColumn("__rts", lit(null).cast("long"))
    val r = right.select(
      col(keyCol), col(tsCol),
      lit(0).as("__side"),
      col(valCol).as("__rv"),
      col(tsCol).cast("long").as("__rts"))
    val merged = l.select((l.columns.filter(c => c != "__side" && c != "__rv" && c != "__rts")
        .map(col) ++ Seq(col("__side"), col("__rv"), col("__rts"))): _*)
      .unionByName(r, allowMissingColumns = true)
    val ord =
      if (backward) Seq(col(tsCol).asc, col("__side").asc, col("__rv").asc)
      else Seq(col(tsCol).desc, col("__side").asc, col("__rv").desc)
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ts = col(tsCol).cast("long")
    val within = tolerance.fold(lit(true)) { tol =>
      if (backward) col("__ats") >= ts - tol else col("__ats") <= ts + tol
    }
    merged
      .withColumn("__av", last(col("__rv"), ignoreNulls = true).over(w))
      .withColumn("__ats", last(col("__rts"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .withColumn(s"asof_$valCol", when(within, col("__av")))
      .withColumn("asof_ts", when(within, col("__ats")))
      .drop("__side", "__rv", "__rts", "__av", "__ats")
  }

  /** leftDf(keyCol, tsCol, left cols), rightDf(keyCol, tsCol, valCol).
    * Emits left rows + `asof_<valCol>` + `asof_ts`. Ties (equal ts): the
    * right row sorts first, so a same-instant right event IS matched. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, valCol: String): DataFrame = {
    val l = left.withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(right.schema(valCol).dataType))
      .withColumn("__rts", lit(null).cast("long"))
    val r = right.select(
      col(keyCol), col(tsCol),
      lit(0).as("__side"),
      col(valCol).as("__rv"),
      col(tsCol).cast("long").as("__rts"))
    val merged = l.select((l.columns.filter(c => c != "__side" && c != "__rv" && c != "__rts")
        .map(col) ++ Seq(col("__side"), col("__rv"), col("__rts"))): _*)
      .unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged
      .withColumn(s"asof_$valCol", last(col("__rv"), ignoreNulls = true).over(w))
      .withColumn("asof_ts", last(col("__rts"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .drop("__side", "__rv", "__rts")
  }
}
