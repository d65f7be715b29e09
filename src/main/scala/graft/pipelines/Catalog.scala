package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sinks.SnapshotTable
import graft.sources.{ColumnNormalizer, Fetch, GeoPackageSource, JsonFlatten,
  MetadataLog, Pipeline, SchemaValidator}

/** The CONCRETE pipeline catalog: each entry binds the generic ingestion
  * primitives (Fetch → parse → normalize → [[graft.sources.SchemaValidator]]
  * → [[graft.sinks.SnapshotTable]]) into one of the reference's named
  * DAGs, with the REAL schema/table names and column templates those
  * pipelines load (reference: `src/pipelines/street_manager.py`,
  * `nhs_prescriptions.py`, `code_point.py`, `bods_timetables.py`,
  * `naptan.py`; templates from the matching `src/data_sources/ *.py`
  * `db_template`s). One entry point runs any of them: [[Catalog.run]].
  *
  * Spark-first shape: a pipeline stage is a DataFrame transform; the
  * single terminal action per table is the transactional
  * [[SnapshotTable.write]] (the warehouse-load analog of the reference's
  * MotherDuck INSERT), and per-stage row counts ride the plan as
  * `observe()` metrics ([[Pipeline.runObserved]]) so metadata logging
  * costs no extra job. At 100 TB, each `load` is a parquet write of an
  * already-partitioned DataFrame — nothing here collects to the driver.
  */
object Catalog {

  /** One conformed output table: name + the DataFrame to land. */
  final case class TableLoad(table: String, df: DataFrame)

  /** A named source binding. `parse` turns a staged local input (the
    * post-[[Fetch.fetchToStaging]] artifact — tests pass committed
    * fixtures) into raw per-table DataFrames; `template` is the
    * warehouse column contract (name → Spark type, in DDL order);
    * `allowMissing` mirrors each reference processor's policy (Street
    * Manager null-fills absent keys, NHS/NaPTAN abort on header drift). */
  final case class SourcePipeline(
      name: String,
      schemaName: String,
      templates: Map[String, Seq[(String, DataType)]],
      allowMissing: Boolean,
      parse: (SparkSession, String, String) => Seq[TableLoad])

  /** Conform a parsed DataFrame to its template: unexpected columns are
    * a hard failure (never silently load drifted data); missing columns
    * null-fill only when the source's policy allows; output columns in
    * template order with template types. */
  private[pipelines] def conform(df: DataFrame,
      template: Seq[(String, DataType)], allowMissing: Boolean): DataFrame = {
    val (missing, extra) = SchemaValidator.validate(df, template.map(_._1))
    require(extra.isEmpty, s"unexpected columns from source: ${extra.mkString(", ")}")
    require(allowMissing || missing.isEmpty,
      s"source is missing template columns: ${missing.mkString(", ")}")
    val have = df.columns.toSet
    df.select(template.map { case (n, t) =>
      (if (have(n)) col(n).cast(t) else lit(null).cast(t)).as(n)
    }: _*)
  }

  private def ddl(pairs: (String, String)*): Seq[(String, DataType)] =
    pairs.map { case (n, t) =>
      n -> (t match {
        case "VARCHAR" => StringType
        case "BIGINT" => LongType
        case "DOUBLE" => DoubleType
        case "TIMESTAMP" => TimestampType
        case other => throw new IllegalArgumentException(other)
      })
    }

  /** Run `pipeline` from a staged input into `warehouseRoot`: every
    * output table becomes the SnapshotTable `warehouseRoot/<schema>/
    * <table>` (transactional commit, time travel, the repo's warehouse
    * table format), with per-stage row counts recorded through the
    * observed single-action path. Returns the landed table roots. */
  def run(spark: SparkSession, pipeline: SourcePipeline, input: String,
          warehouseRoot: String): Map[String, String] = {
    val scratch = java.nio.file.Files
      .createTempDirectory(s"graft-${pipeline.name}").toString
    try {
      pipeline.parse(spark, input, scratch).map { case TableLoad(table, raw) =>
        val template = pipeline.templates(table)
        val root = s"$warehouseRoot/${pipeline.schemaName}/$table"
        val records = Pipeline.runObserved(
          pipeline.name, raw,
          Seq(Pipeline.Stage("conform",
            df => conform(df, template, pipeline.allowMissing))),
          out => { SnapshotTable.write(out, root); () })
        MetadataLog.append(spark, records,
          s"$warehouseRoot/${pipeline.schemaName}/processing_logs")
        table -> root
      }.toMap
    } finally {
      // every table load has materialized through SnapshotTable.write by
      // here, so the unzipped payload (multi-GB for real archives) must
      // not outlive the run — scheduled loads would accrete /tmp forever
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(scratch)
      val walk = java.nio.file.Files.walk(root)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  /** Convenience: run by name from [[all]]. */
  def run(spark: SparkSession, name: String, input: String,
          warehouseRoot: String): Map[String, String] =
    run(spark, all(name), input, warehouseRoot)

  // ------------------------------------------------------ street manager

  /** Street Manager archived permit data (street_manager.py): a zip of
    * per-permit NESTED json (`object_data.*`), flattened and
    * prefix-stripped exactly like the reference's `flatten_json` +
    * `rename_columns`, landed in the raw monthly table. Missing keys
    * null-fill (the reference inserts only the columns present). */
  val streetManager: SourcePipeline = SourcePipeline(
    name = "street_manager",
    schemaName = "raw_data_2025",
    templates = Map("01_2025" -> ddl(
      "version" -> "BIGINT", "event_reference" -> "BIGINT",
      "event_type" -> "VARCHAR", "event_time" -> "VARCHAR",
      "object_type" -> "VARCHAR", "object_reference" -> "VARCHAR",
      "work_reference_number" -> "VARCHAR", "work_category" -> "VARCHAR",
      "work_category_ref" -> "VARCHAR", "work_status" -> "VARCHAR",
      "work_status_ref" -> "VARCHAR", "activity_type" -> "VARCHAR",
      "permit_reference_number" -> "VARCHAR", "permit_status" -> "VARCHAR",
      "permit_conditions" -> "VARCHAR", "collaborative_working" -> "VARCHAR",
      "promoter_swa_code" -> "VARCHAR", "promoter_organisation" -> "VARCHAR",
      "highway_authority" -> "VARCHAR",
      "highway_authority_swa_code" -> "VARCHAR",
      "works_location_coordinates" -> "VARCHAR",
      "works_location_type" -> "VARCHAR", "town" -> "VARCHAR",
      "street_name" -> "VARCHAR", "usrn" -> "VARCHAR",
      "road_category" -> "VARCHAR", "area_name" -> "VARCHAR",
      "traffic_management_type" -> "VARCHAR",
      "traffic_management_type_ref" -> "VARCHAR",
      "proposed_start_date" -> "VARCHAR", "proposed_end_date" -> "VARCHAR",
      "actual_start_date_time" -> "VARCHAR",
      "actual_end_date_time" -> "VARCHAR", "is_ttro_required" -> "VARCHAR",
      "is_traffic_sensitive" -> "VARCHAR", "is_deemed" -> "VARCHAR")),
    allowMissing = true,
    parse = (spark, input, scratch) => {
      val dir =
        if (input.endsWith(".zip")) { Fetch.unzip(input, scratch); scratch }
        else input
      val nested = spark.read.option("multiLine", "true").json(dir)
      val flat = ColumnNormalizer.stripPrefix(
        JsonFlatten.flatten(nested, sep = "."), "object_data.")
      Seq(TableLoad("01_2025", flat))
    })

  // ------------------------------------------------- nhs prescriptions

  /** NHS English Prescribing monthly CSV (nhs_prescriptions.py),
    * post-March-2025 column set (`db_template_current`). Header drift
    * aborts the load — the reference's validate_column_names policy. */
  val nhsPrescriptions: SourcePipeline = SourcePipeline(
    name = "nhs_prescriptions",
    schemaName = "nhs_prescribing_raw_data",
    templates = Map("nhs_prescriptions_05_2025" -> ddl(
      "YEAR_MONTH" -> "VARCHAR", "REGIONAL_OFFICE_NAME" -> "VARCHAR",
      "REGIONAL_OFFICE_CODE" -> "VARCHAR", "ICB_NAME" -> "VARCHAR",
      "ICB_CODE" -> "VARCHAR", "PCO_NAME" -> "VARCHAR",
      "PCO_CODE" -> "VARCHAR", "PRACTICE_NAME" -> "VARCHAR",
      "PRACTICE_CODE" -> "VARCHAR", "ADDRESS_1" -> "VARCHAR",
      "ADDRESS_2" -> "VARCHAR", "ADDRESS_3" -> "VARCHAR",
      "ADDRESS_4" -> "VARCHAR", "POSTCODE" -> "VARCHAR",
      "BNF_CHEMICAL_SUBSTANCE_CODE" -> "VARCHAR",
      "BNF_CHEMICAL_SUBSTANCE" -> "VARCHAR",
      "BNF_PRESENTATION_CODE" -> "VARCHAR",
      "BNF_PRESENTATION_NAME" -> "VARCHAR",
      "BNF_CHAPTER_PLUS_CODE" -> "VARCHAR", "QUANTITY" -> "DOUBLE",
      "ITEMS" -> "BIGINT", "TOTAL_QUANTITY" -> "DOUBLE",
      "ADQ_USAGE" -> "DOUBLE", "NIC" -> "DOUBLE",
      "ACTUAL_COST" -> "DOUBLE", "UNIDENTIFIED" -> "VARCHAR",
      "SNOMED_CODE" -> "BIGINT")),
    allowMissing = false,
    parse = (spark, input, _) => Seq(TableLoad("nhs_prescriptions_05_2025",
      spark.read.option("header", "true").csv(input))))

  // ------------------------------------------------------- code point

  /** Code-Point Open postcode units (code_point.py): the GeoPackage is
    * read natively ([[GeoPackageSource]] — no GDAL), geometry rendered
    * to WKT exactly like the reference's shapely `wkt.dumps`, landed
    * with the postcode admin-code columns. */
  val codePoint: SourcePipeline = SourcePipeline(
    name = "code_point",
    schemaName = "post_code_data",
    templates = Map("code_point_latest" -> ddl(
      "postcode" -> "VARCHAR", "positional_quality_indicator" -> "VARCHAR",
      "country_code" -> "VARCHAR", "nhs_regional_ha_code" -> "VARCHAR",
      "nhs_ha_code" -> "VARCHAR", "admin_county_code" -> "VARCHAR",
      "admin_district_code" -> "VARCHAR", "admin_ward_code" -> "VARCHAR",
      "geometry" -> "VARCHAR")),
    allowMissing = false,
    parse = (spark, input, scratch) => {
      val gpkg =
        if (input.endsWith(".zip"))
          Fetch.unzip(input, scratch).find(_.endsWith(".gpkg"))
            .getOrElse(sys.error("no .gpkg member in archive"))
        else input
      val feats = GeoPackageSource.readFeatures(spark, gpkg, "code_point")
      // readFeatures surfaces the parsed geometry as <geom>_xy
      // (array<struct<x,y>>); render WKT where the reference renders
      // shapely wkt.dumps
      val df = feats
        .withColumn("geometry", graft.functions.Geo.stAsText(col("geom_xy"), 1))
        .drop("geom", "geom_xy", "fid")
      Seq(TableLoad("code_point_latest", df))
    })

  // -------------------------------------------------- bods timetables

  /** BODS GTFS timetable zip (bods_timetables.py): every recognized
    * member (`agency.txt`, `routes.txt`, …) becomes its own table with
    * its own header contract — one pipeline, N tables, exactly the
    * reference's filename→table mapping. */
  val bodsTimetables: SourcePipeline = SourcePipeline(
    name = "bods_timetables",
    schemaName = "bods_timetables",
    templates = Map(
      "agency" -> ddl("agency_id" -> "VARCHAR", "agency_name" -> "VARCHAR",
        "agency_url" -> "VARCHAR", "agency_timezone" -> "VARCHAR",
        "agency_lang" -> "VARCHAR", "agency_phone" -> "VARCHAR",
        "agency_noc" -> "VARCHAR"),
      "calendar" -> ddl("service_id" -> "VARCHAR", "monday" -> "VARCHAR",
        "tuesday" -> "VARCHAR", "wednesday" -> "VARCHAR",
        "thursday" -> "VARCHAR", "friday" -> "VARCHAR",
        "saturday" -> "VARCHAR", "sunday" -> "VARCHAR",
        "start_date" -> "VARCHAR", "end_date" -> "VARCHAR"),
      "calendar_dates" -> ddl("service_id" -> "VARCHAR", "date" -> "VARCHAR",
        "exception_type" -> "VARCHAR"),
      "routes" -> ddl("route_id" -> "VARCHAR", "agency_id" -> "VARCHAR",
        "route_short_name" -> "VARCHAR", "route_long_name" -> "VARCHAR",
        "route_type" -> "VARCHAR"),
      "stops" -> ddl("stop_id" -> "VARCHAR", "stop_code" -> "VARCHAR",
        "stop_name" -> "VARCHAR", "stop_lat" -> "VARCHAR",
        "stop_lon" -> "VARCHAR", "wheelchair_boarding" -> "VARCHAR",
        "location_type" -> "VARCHAR", "parent_station" -> "VARCHAR",
        "platform_code" -> "VARCHAR"),
      "stop_times" -> ddl("trip_id" -> "VARCHAR", "arrival_time" -> "VARCHAR",
        "departure_time" -> "VARCHAR", "stop_id" -> "VARCHAR",
        "stop_sequence" -> "VARCHAR", "stop_headsign" -> "VARCHAR",
        "pickup_type" -> "VARCHAR", "drop_off_type" -> "VARCHAR",
        "shape_dist_traveled" -> "VARCHAR", "timepoint" -> "VARCHAR",
        "stop_direction_name" -> "VARCHAR"),
      "trips" -> ddl("route_id" -> "VARCHAR", "service_id" -> "VARCHAR",
        "trip_id" -> "VARCHAR", "trip_headsign" -> "VARCHAR",
        "direction_id" -> "VARCHAR", "block_id" -> "VARCHAR",
        "shape_id" -> "VARCHAR", "wheelchair_accessible" -> "VARCHAR",
        "trip_direction_name" -> "VARCHAR", "vehicle_journey_code" -> "VARCHAR")),
    allowMissing = false,
    parse = (spark, input, scratch) => {
      val members = Fetch.unzip(input, scratch)
      members.flatMap { m =>
        val base = new java.io.File(m).getName.toLowerCase
          .stripSuffix(".txt")
        if (!m.toLowerCase.endsWith(".txt") ||
            !bodsTimetables.templates.contains(base)) None
        else Some(TableLoad(base,
          spark.read.option("header", "true").csv(m)))
      }
    })

  // ------------------------------------------------------------ naptan

  /** NaPTAN national stop registry CSV (naptan.py): one table
    * (`LATEST_STOPS`), full 43-column header contract, typed casts for
    * the coordinate/timestamp/revision columns — the reference's
    * clean_naptan_data typing. */
  val naptan: SourcePipeline = SourcePipeline(
    name = "naptan",
    schemaName = "naptan_data",
    templates = Map("LATEST_STOPS" -> ddl(
      "ATCOCode" -> "VARCHAR", "NaptanCode" -> "VARCHAR",
      "PlateCode" -> "VARCHAR", "CleardownCode" -> "VARCHAR",
      "CommonName" -> "VARCHAR", "CommonNameLang" -> "VARCHAR",
      "ShortCommonName" -> "VARCHAR", "ShortCommonNameLang" -> "VARCHAR",
      "Landmark" -> "VARCHAR", "LandmarkLang" -> "VARCHAR",
      "Street" -> "VARCHAR", "StreetLang" -> "VARCHAR",
      "Crossing" -> "VARCHAR", "CrossingLang" -> "VARCHAR",
      "Indicator" -> "VARCHAR", "IndicatorLang" -> "VARCHAR",
      "Bearing" -> "VARCHAR", "NptgLocalityCode" -> "VARCHAR",
      "LocalityName" -> "VARCHAR", "ParentLocalityName" -> "VARCHAR",
      "GrandParentLocalityName" -> "VARCHAR", "Town" -> "VARCHAR",
      "TownLang" -> "VARCHAR", "Suburb" -> "VARCHAR",
      "SuburbLang" -> "VARCHAR", "LocalityCentre" -> "VARCHAR",
      "GridType" -> "VARCHAR", "Easting" -> "BIGINT",
      "Northing" -> "BIGINT", "Longitude" -> "DOUBLE",
      "Latitude" -> "DOUBLE", "StopType" -> "VARCHAR",
      "BusStopType" -> "VARCHAR", "TimingStatus" -> "VARCHAR",
      "DefaultWaitTime" -> "VARCHAR", "Notes" -> "VARCHAR",
      "NotesLang" -> "VARCHAR", "AdministrativeAreaCode" -> "VARCHAR",
      "CreationDateTime" -> "TIMESTAMP",
      "ModificationDateTime" -> "TIMESTAMP", "RevisionNumber" -> "BIGINT",
      "Modification" -> "VARCHAR", "Status" -> "VARCHAR")),
    allowMissing = false,
    parse = (spark, input, _) => Seq(TableLoad("LATEST_STOPS",
      spark.read.option("header", "true").csv(input))))

  /** Every catalog entry by pipeline name — the dispatch table behind
    * the by-name [[run]]. */
  val all: Map[String, SourcePipeline] = Seq(
    streetManager, nhsPrescriptions, codePoint, bodsTimetables, naptan)
    .map(p => p.name -> p).toMap
}
