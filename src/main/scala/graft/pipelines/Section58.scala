package graft.pipelines

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sinks.SnapshotTable
import graft.sources.{ColumnNormalizer, Fetch, JsonFlatten}

/** The Section 58 restriction warehouse — the reference's one SCD-type-2
  * staging → dimension pattern, end to end (reference:
  * src/pipelines/section_58.py, src/data_sources/section_58.py:48-356,
  * src/data_processors/section_58.py).
  *
  * Each monthly archive of nested restriction events lands in
  * `section_58.staging_section_58` (cleared per load — the reference's
  * TRUNCATE + INSERT), then [[applyScd2]] merges the LATEST event per
  * restriction into `section_58.dim_section_58`:
  *
  *  - first load: every latest event opens a current version
  *    (`initial_load` SQL, section_58.py:221-268);
  *  - later loads: a current dim row with a STRICTLY NEWER staged event
  *    closes (`valid_to` = load time, `is_current` = false —
  *    `mark_changed`, :271-291) and the newer event opens the next
  *    version (`insert_new_changed`, :294-354). Faithfully to the
  *    reference, recency is judged on event_time alone — an attribute
  *    no-op with a newer event still versions (the record_hash column is
  *    carried for downstream audit, not used as the change predicate).
  *
  * Spark-first shape: the dimension update is a PURE function
  * (old dim, staging) → new dim — one hash join on the restriction key
  * plus one per-key aggregate of the (small) monthly delta; the result
  * commits as the next [[SnapshotTable]] snapshot, so the warehouse
  * UPDATE+INSERT pair is a single transactional commit with time travel
  * instead of two in-place mutations. At 100 TB the join shuffles on
  * `section_58_reference_number`; the delta side is one month of events
  * and broadcasts under AQE.
  *
  * `loadTs` parameterizes the reference's CURRENT_TIMESTAMP so replays
  * and tests are deterministic.
  */
object Section58 {

  val schemaName = "section_58"
  val stagingTable = "staging_section_58"
  val dimensionTable = "dim_section_58"

  /** staging_db_template (section_58.py:121-143). */
  val stagingTemplate: Seq[(String, DataType)] = Seq(
    "section_58_reference_number" -> StringType,
    "section_58_coordinates" -> StringType,
    "section_58_status" -> StringType,
    "start_date" -> StringType, "end_date" -> StringType,
    "section_58_duration" -> StringType, "section_58_extent" -> StringType,
    "section_58_location_type" -> StringType,
    "status_change_date" -> StringType,
    "highway_authority_swa_code" -> StringType,
    "highway_authority" -> StringType, "usrn" -> StringType,
    "street_name" -> StringType, "area_name" -> StringType,
    "town" -> StringType, "event_reference" -> LongType,
    "event_type" -> StringType, "event_time" -> StringType,
    "object_type" -> StringType, "object_reference" -> StringType,
    "version" -> IntegerType)

  /** Parse one monthly archive (zip of nested event json — the Street
    * Manager feed shape) into the staging contract: flatten,
    * `object_data.` prefix stripped, conformed to the template with
    * null-fill (events carry only the keys present). */
  def stage(spark: SparkSession, input: String, scratch: String): DataFrame =
    Catalog.conform(
      Catalog.parseStreetManagerArchive(spark, input, scratch),
      stagingTemplate, allowMissing = true)

  /** Latest staged event per restriction: `ROW_NUMBER() OVER (PARTITION
    * BY reference ORDER BY event_time DESC, event_reference DESC) = 1`
    * over `object_type = 'SECTION_58'` (the CTE every SCD statement
    * shares, section_58.py:255-265). */
  private def latestPerRef(staging: DataFrame): DataFrame = {
    val w = Window.partitionBy("section_58_reference_number")
      .orderBy(col("event_time").try_cast(TimestampType).desc,
        col("event_reference").desc)
    staging.where(col("object_type") === "SECTION_58")
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }

  /** A latest-event row dressed as a dimension version (the typed SELECT
    * list shared by initial_load and insert_new_changed,
    * section_58.py:228-254): TRY_CASTs per the reference, record_hash =
    * md5 of the RAW staged attribute strings. */
  private def dressVersion(latest: DataFrame, loadTs: Timestamp): DataFrame =
    latest.select(
      col("section_58_reference_number"), col("usrn"),
      col("section_58_status").as("status"),
      substring(col("start_date"), 1, 10).try_cast(DateType).as("start_date"),
      substring(col("end_date"), 1, 10).try_cast(DateType).as("end_date"),
      col("section_58_duration").as("duration"),
      col("section_58_extent").as("extent"),
      col("section_58_location_type").as("location_type"),
      col("section_58_coordinates").as("coordinates"),
      col("status_change_date").try_cast(TimestampType).as("status_change_date"),
      col("highway_authority_swa_code"), col("highway_authority"),
      col("street_name"), col("area_name"), col("town"), col("event_type"),
      col("event_time").try_cast(TimestampType).as("event_time"),
      lit(loadTs).as("valid_from"),
      lit(Timestamp.valueOf("9999-12-31 00:00:00")).as("valid_to"),
      lit(true).as("is_current"),
      md5(concat_ws("|",
        coalesce(col("section_58_status"), lit("")),
        coalesce(col("start_date"), lit("")),
        coalesce(col("end_date"), lit("")),
        coalesce(col("section_58_duration"), lit("")),
        coalesce(col("section_58_extent"), lit("")),
        coalesce(col("section_58_location_type"), lit(""))))
        .as("record_hash"))

  private val dimAttrCols: Seq[String] = Seq(
    "section_58_reference_number", "usrn", "status", "start_date",
    "end_date", "duration", "extent", "location_type", "coordinates",
    "status_change_date", "highway_authority_swa_code",
    "highway_authority", "street_name", "area_name", "town", "event_type",
    "event_time", "valid_from", "valid_to", "is_current", "record_hash")

  /** (old dim, staging) → new dim. Pure and deterministic: surrogate
    * keys continue from the old maximum in reference order (the
    * sequence's nextval, without driver-side state); the key window runs
    * over the MONTHLY INSERT DELTA only, never the full dimension. */
  def applyScd2(dim: Option[DataFrame], staging: DataFrame,
                loadTs: Timestamp): DataFrame = {
    val latest = latestPerRef(staging)
    val fresh = dressVersion(latest, loadTs)
    val keyed = Window.orderBy("section_58_reference_number")
    dim match {
      case None =>
        fresh.withColumn("surrogate_key",
          row_number().over(keyed).cast("int"))
          .select(("surrogate_key" +: dimAttrCols).map(col): _*)
      case Some(d) =>
        // one row per ref in `latest` by construction: a single left
        // join gives every dim row its (possibly null) newer event time
        val newer = latest.select(col("section_58_reference_number"),
          col("event_time").try_cast(TimestampType).as("__l_ts"))
        val closed = d.join(newer, Seq("section_58_reference_number"), "left")
          .withColumn("__close", col("is_current") &&
            col("__l_ts").isNotNull && col("__l_ts") > col("event_time"))
          .withColumn("valid_to",
            when(col("__close"), lit(loadTs)).otherwise(col("valid_to")))
          .withColumn("is_current",
            when(col("__close"), lit(false)).otherwise(col("is_current")))
          .drop("__l_ts", "__close")
        // insert keys that are brand new OR strictly newer than the
        // newest dim version for that key (insert_new_changed :338-353).
        // Key presence is its own flag: `max(event_time) IS NULL` cannot
        // distinguish an absent key from a present key whose versions all
        // carry NULL event_time — the reference's NOT EXISTS skips the
        // insert for the latter (a NULL-timestamped current row would
        // otherwise gain a duplicate open version that no later load can
        // ever close)
        val dMax = d.groupBy("section_58_reference_number")
          .agg(max("event_time").as("__d_max"),
            max(lit(true)).as("__d_present"))
        val maxKey = d.agg(coalesce(max("surrogate_key"), lit(0)))
          .head().getInt(0)
        val inserts = fresh
          .join(dMax, Seq("section_58_reference_number"), "left")
          .where(col("__d_present").isNull ||
            (col("event_time").isNotNull && col("event_time") > col("__d_max")))
          .drop("__d_max", "__d_present")
          .withColumn("surrogate_key",
            (row_number().over(keyed) + maxKey).cast("int"))
          .select(("surrogate_key" +: dimAttrCols).map(col): _*)
        closed.unionByName(inserts)
    }
  }

  /** Land one monthly archive: staging replaced (the reference's
    * clear_staging + INSERT), dimension advanced one SCD2 snapshot.
    * Returns the two table roots. */
  def run(spark: SparkSession, input: String, warehouseRoot: String,
          loadTs: Timestamp): Map[String, String] =
    Fetch.withScratchDir("graft-section58") { scratch =>
      val stagingRoot = s"$warehouseRoot/$schemaName/$stagingTable"
      val dimRoot = s"$warehouseRoot/$schemaName/$dimensionTable"
      val staged = stage(spark, input, scratch)
      SnapshotTable.write(staged, stagingRoot)
      val prior =
        if (SnapshotTable.versions(spark, dimRoot).nonEmpty)
          Some(SnapshotTable.read(spark, dimRoot))
        else None
      val next = applyScd2(prior, SnapshotTable.read(spark, stagingRoot), loadTs)
      SnapshotTable.write(next, dimRoot)
      Map(stagingTable -> stagingRoot, dimensionTable -> dimRoot)
    }
}
