package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence analytics: funnel conversion and cohort retention — the
  * two classic product-analytics rollups over an event stream (the
  * reference's events-shaped sources: BODS location pings, street-manager
  * permit state changes — "how far do entities progress through a staged
  * lifecycle, and do they come back"). Both are single-hash-shuffle
  * designs: nothing global, nothing quadratic, no windows over an
  * unbounded keyspace.
  */
object Funnel {

  /** Earliest-entry funnel: per user, t1 = first `steps(0)` event, then
    * t_{i+1} = first `steps(i)` event strictly after t_i and within
    * `windowSec` of t1; a user "reaches step i" if t_i exists. Returns
    * one row per step — (step, step_name, users) — including zero rows.
    *
    * Scale design: filter to funnel event types, ONE hash shuffle on the
    * user, per-user sort of that user's (bounded) funnel events, then a
    * left-fold over the sorted array computes every step time in one
    * pass — the greedy first-qualifying pick equals the iterated
    * min-per-step definition (the oracle's CTE chain), which a spec pins.
    * Per-user state is `k` longs; the final rollup is k rows.
    */
  def funnel(events: DataFrame, userCol: Column, typeCol: Column, secCol: Column,
             tieCol: Column, steps: Seq[String], windowSec: Long): DataFrame = {
    val k = steps.size
    val stepsArr = array(steps.map(lit): _*)
    val perUser = events
      .where(typeCol.isin(steps: _*))
      .groupBy(userCol.as("user"))
      .agg(array_sort(collect_list(struct(secCol.cast("long").as("sec"),
        tieCol.as("tie"), typeCol.as("typ")))).as("evs"))
      // fold state: k step times, Long.MinValue = not reached (an actual
      // event second can never collide, unlike -1 = one sec before epoch);
      // depth = #reached
      .select(aggregate(col("evs"), array_repeat(lit(Long.MinValue), k), (acc, ev) => {
        val depth = size(filter(acc, x => x =!= lit(Long.MinValue)))
        val inOrder = ev("sec") > element_at(acc, depth) &&
          ev("sec") <= element_at(acc, lit(1)) + lit(windowSec)
        val advances = depth < lit(k) &&
          ev("typ") === element_at(stepsArr, depth + lit(1)) &&
          (depth === lit(0) || inOrder)
        when(advances,
          transform(acc, (x, i) => when(i === depth, ev("sec")).otherwise(x)))
          .otherwise(acc)
      }).as("times"))
      .select(size(filter(col("times"), x => x =!= lit(Long.MinValue))).as("depth"))
    // emit every step, 0-filled: steps nobody reached must still appear
    val stepDf = events.sparkSession.range(1, k + 1)
      .select(col("id").as("step"),
        element_at(stepsArr, col("id").cast("int")).as("step_name"))
    val reached = perUser
      // guard: sequence(1, 0) counts DOWN in Spark — depth-0 users emit nothing
      .where(col("depth") >= 1)
      .select(explode(sequence(lit(1L), col("depth").cast("long"))).as("step"))
      .groupBy("step").agg(count(lit(1)).as("users"))
    stepDf.join(reached, Seq("step"), "left")
      .select(col("step"), col("step_name"),
        coalesce(col("users"), lit(0L)).as("users"))
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * (from_type, to_type, n, p_ppm) where p is the row-normalized
    * transition probability in exact integer ppm — the "user journey"
    * statistic behind next-event prediction features. One lead() window
    * PARTITIONED BY user (same hash shuffle the sessionizer uses —
    * nothing global), then a types x types rollup; the ppm normalization
    * windows over the aggregated matrix (|types|² rows). */
  def transitions(events: DataFrame, userCol: Column, typeCol: Column,
                  secCol: Column, tieCol: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(userCol).orderBy(secCol, tieCol)
    events
      .select(userCol, typeCol.as("from_type"), secCol, tieCol)
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .where(col("to_type").isNotNull)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      // ppm via the shared DECIMAL(38,0) form (Curate.ppmDivSql): the
      // raw BIGINT product n * 1e6 leaves the long range past ~9.2e12
      // transitions of one type, where DuckDB's widened // stays exact
      .withColumn("__row_n",
        expr("sum(n) OVER (PARTITION BY from_type)"))
      .withColumn("p_ppm", expr(Curate.ppmDivSql("n", "__row_n")))
      .drop("__row_n")
      // Deterministic output order: the matrix is |types|^2 rows, so a
      // global sort is free and makes the result hash-stable regardless
      // of how the consumer captures it.
      .orderBy("from_type", "to_type")
  }

  /** Weekly cohort retention: cohort = epoch-week of the user's first
    * `anchorType` event; a cohort "retains" a user at offset `o` if the
    * user has ANY event in cohort_week + o. Returns
    * (cohort_week, week_offset, users) for offsets 0..maxOffset.
    * Week bucket = epoch seconds over 604800, truncated toward zero —
    * exactly DuckDB's integer `//` (also truncating), so both engines
    * bucket identically including pre-1970 seconds; the double division
    * below is exact for any |sec| < 2^53.
    *
    * Scale: cohort table and distinct activity are both user-keyed
    * aggregates; their equi-join co-partitions on the user, and the final
    * rollup is at most cohorts x offsets rows. */
  def retention(events: DataFrame, userCol: Column, typeCol: Column,
                secCol: Column, anchorType: String, maxOffset: Int): DataFrame = {
    val wk = (secCol.cast("long") / lit(604800L)).cast("long")
    val cohorts = events.where(typeCol === anchorType)
      .groupBy(userCol.as("user")).agg(min(wk).as("cohort_week"))
    val activity = events.select(userCol.as("user"), wk.as("wk")).distinct()
    cohorts.join(activity, "user") // (user, wk) unique => count(*) is users
      .select(col("cohort_week"), (col("wk") - col("cohort_week")).as("week_offset"))
      .where(col("week_offset").between(0, maxOffset))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("users"))
  }
}
