package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for multi-dimensional scan pruning.
  *
  * At 100 TB, file- and row-group-level min/max statistics are the first
  * line of defense: a scan with predicates on (x, y) skips every file
  * whose stat range misses the box. A single-column sort gives skipping
  * on that column only; interleaving the bit-ranks of SEVERAL columns
  * (the Morton curve) keeps every file's bounding box small in ALL
  * clustered dimensions, so multi-dimensional point/range lookups touch
  * a handful of files instead of the whole table. Same idea as
  * Delta/Iceberg OPTIMIZE ZORDER BY, expressed with stock Spark:
  * an expression computes the z-value, `repartitionByRange` +
  * `sortWithinPartitions` on it produce the layout — no custom writer.
  *
  * Normalization uses min/max scaling into `bits`-bit buckets (one cheap
  * agg pass; uniformity is not required for correctness — skew only
  * degrades skipping toward the single-column case, never below it for
  * the leading bits).
  */
object ZOrder {

  /** Bit-interleaved z-value of `cols` (each min/max-normalized into
    * `bits` buckets). Pure expression — codegen'd, shuffle-free. */
  def zValue(cols: Seq[Column], mins: Seq[Double], maxs: Seq[Double],
             bits: Int = 16): Column = {
    require(cols.size * bits <= 62, s"${cols.size} cols x $bits bits > 62")
    val n = cols.size
    val hi = (1L << bits) - 1
    val norm = cols.zipWithIndex.map { case (c, i) =>
      val span = maxs(i) - mins(i)
      if (span <= 0) lit(0L)
      else least(lit(hi), greatest(lit(0L),
        floor((c.cast("double") - mins(i)) / (span / (1L << bits))).cast("long")))
    }
    // result bit (b*n + i) = bit b of norm(i)
    (0 until bits).flatMap { b =>
      norm.zipWithIndex.map { case (nc, i) =>
        shiftleft(shiftright(nc, b).bitwiseAND(lit(1L)), b * n + i)
      }
    }.reduce((a, c) => a.bitwiseOR(c))
  }

  /** Write `df` z-ordered on `clusterCols` into `nFiles` parquet files:
    * one min/max agg pass, then range-partition + sort on the z-value.
    * Composes with [[ParquetSink.writePartitioned]]-style partition dirs
    * by z-ordering within each partition's DataFrame before the write. */
  def write(df: DataFrame, path: String, clusterCols: Seq[String],
            nFiles: Int, bits: Int = 16): Unit = {
    // the internal sort key would silently REPLACE (then drop) a user
    // column of the same name — refuse instead of losing data
    require(!df.columns.contains("__z"),
      "ZOrder.write: input already has a __z column; rename it first")
    val aggs = clusterCols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"mn_$c"),
      max(col(c).cast("double")).as(s"mx_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    if (stats.isNullAt(0)) { // empty input: nothing to cluster
      df.write.mode("overwrite").parquet(path)
      return
    }
    val mins = clusterCols.map(c => stats.getAs[Double](s"mn_$c"))
    val maxs = clusterCols.map(c => stats.getAs[Double](s"mx_$c"))
    df.withColumn("__z", zValue(clusterCols.map(col), mins, maxs, bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
