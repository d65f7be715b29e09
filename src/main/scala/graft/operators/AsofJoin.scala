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
      // ONE struct per right row, so the matched value and its timestamp
      // can never decouple: two independent last(ignoreNulls) calls would
      // take the value from an older event but the ts (and the tolerance
      // gate) from a newer null-valued one — a pair that never existed
      .withColumn("__rp",
        when(col("__side") === 0, struct(col("__rts"), col("__rv"))))
      .withColumn("__ap", last(col("__rp"), ignoreNulls = true).over(w))
      .withColumn("__av", col("__ap.__rv"))
      .withColumn("__ats", col("__ap.__rts"))
      .where(col("__side") === 1)
      .withColumn(s"asof_$valCol", when(within, col("__av")))
      .withColumn("asof_ts", when(within, col("__ats")))
      .drop("__side", "__rv", "__rts", "__rp", "__ap", "__av", "__ats")
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
    // __rv in the order pins same-(key, ts) right-row ties (matching
    // asofJoinDir): without it a retry or partition-count change could
    // flip which of two equal-ts right values wins
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"), col("__rv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged
      // struct-paired like asofJoinDir: value and ts from the SAME row
      .withColumn("__rp",
        when(col("__side") === 0, struct(col("__rts"), col("__rv"))))
      .withColumn("__ap", last(col("__rp"), ignoreNulls = true).over(w))
      .withColumn(s"asof_$valCol", col("__ap.__rv"))
      .withColumn("asof_ts", col("__ap.__rts"))
      .where(col("__side") === 1)
      .drop("__side", "__rv", "__rts", "__rp", "__ap")
  }
}
