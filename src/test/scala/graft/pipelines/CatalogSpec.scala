package graft.pipelines

import graft.SparkSpec
import graft.sinks.SnapshotTable
import graft.sources.MetadataLog
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Integration specs for the concrete pipeline catalog: each test runs
  * its pipeline end-to-end over a committed fixture that mirrors the
  * real source's container format and column set
  * (tools/make_pipeline_fixtures.py), through the single
  * [[Catalog.run]] entry point, into SnapshotTable warehouse tables —
  * then reads the landed table back and pins schema + content. */
class CatalogSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(name: String): String =
    getClass.getResource(s"/graft/pipelines/$name").getPath

  private def warehouse(): String =
    java.nio.file.Files.createTempDirectory("graft-warehouse").toString

  test("street_manager: zip of nested permit json -> flattened, prefix-stripped, null-filled monthly table") {
    val wh = warehouse()
    val tables = Catalog.run(spark, "street_manager", fixture("street_manager.zip"), wh)
    assert(tables.keySet === Set("01_2025"))
    val df = SnapshotTable.read(spark, tables("01_2025"))
    assert(df.count() === 6)
    // template order and names (object_data. prefix gone)
    assert(df.columns.take(4).toSeq ===
      Seq("version", "event_reference", "event_type", "event_time"))
    assert(df.columns.contains("work_reference_number") &&
      !df.columns.exists(_.startsWith("object_data")))
    // keys absent from the source null-fill (the street-manager policy)
    assert(df.where(col("town").isNull).count() === 6)
    assert(df.where(col("collaborative_working").isNull).count() === 6)
    // real values survive the flatten
    val r = df.where(col("event_reference") === 529770).head()
    assert(r.getAs[String]("event_type") === "WORK_START")
    assert(r.getAs[String]("highway_authority") === "CITY OF WESTMINSTER")
    assert(r.getAs[String]("usrn") === "8401426")
    // metadata logging landed beside the data
    val logs = MetadataLog.read(spark, s"$wh/raw_data_2025/processing_logs")
    assert(logs.where(col("pipeline") === "street_manager").count() >= 1)
  }

  test("nhs_prescriptions: EPD monthly CSV -> typed table; header drift aborts") {
    val wh = warehouse()
    val tables = Catalog.run(spark, "nhs_prescriptions", fixture("nhs_prescriptions.csv"), wh)
    val df = SnapshotTable.read(spark, tables("nhs_prescriptions_05_2025"))
    assert(df.count() === 8)
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("QUANTITY") === DoubleType)
    assert(types("ITEMS") === LongType)
    assert(types("SNOMED_CODE") === LongType)
    assert(types("BNF_PRESENTATION_NAME") === StringType)
    assert(df.agg(sum("ITEMS")).head().getLong(0) === (1 to 8).sum)
    // drifted header (extra column) must ABORT, not silently load
    val drifted = spark.read.option("header", "true")
      .csv(fixture("nhs_prescriptions.csv"))
      .withColumn("ROGUE_COLUMN", lit("x"))
    val e = intercept[Exception] {
      Catalog.conform(drifted,
        Catalog.nhsPrescriptions.templates("nhs_prescriptions_05_2025"),
        allowMissing = false)
    }
    assert(e.getMessage.contains("ROGUE_COLUMN"))
  }

  test("code_point: GeoPackage read natively -> WKT geometry + admin-code columns") {
    val wh = warehouse()
    val tables = Catalog.run(spark, "code_point", fixture("code_point.gpkg"), wh)
    val df = SnapshotTable.read(spark, tables("code_point_latest"))
    assert(df.count() === 4)
    assert(df.columns.toSeq === Catalog.codePoint
      .templates("code_point_latest").map(_._1))
    val sw1a = df.where(col("postcode") === "SW1A 1AA").head()
    assert(sw1a.getAs[String]("geometry") === "POINT (529090.0 179645.0)")
    assert(sw1a.getAs[String]("admin_district_code") === "E09000033")
    assert(df.where(col("geometry").startsWith("POINT (")).count() === 4)
  }

  test("bods_timetables: GTFS zip -> one table per recognized member, others skipped") {
    val wh = warehouse()
    val tables = Catalog.run(spark, "bods_timetables", fixture("bods_gtfs.zip"), wh)
    assert(tables.keySet === Set("agency", "routes", "stops", "calendar",
      "trips", "stop_times")) // readme.md skipped
    assert(SnapshotTable.read(spark, tables("agency")).count() === 2)
    assert(SnapshotTable.read(spark, tables("stop_times")).count() === 2)
    val stops = SnapshotTable.read(spark, tables("stops"))
    assert(stops.columns.toSeq === Catalog.bodsTimetables
      .templates("stops").map(_._1))
    assert(stops.where(col("stop_id") === "S2")
      .head().getAs[String]("wheelchair_boarding") === "1")
    // referential sanity across the landed tables (a real GTFS join)
    val joined = SnapshotTable.read(spark, tables("trips"))
      .join(SnapshotTable.read(spark, tables("routes")), "route_id")
      .join(SnapshotTable.read(spark, tables("agency")), "agency_id")
    assert(joined.select("agency_name").as[String].collect().toSeq === Seq("Op One"))
  }

  test("naptan: LATEST_STOPS CSV -> typed coordinates and timestamps") {
    val wh = warehouse()
    val tables = Catalog.run(spark, "naptan", fixture("naptan_stops.csv"), wh)
    val df = SnapshotTable.read(spark, tables("LATEST_STOPS"))
    assert(df.count() === 6)
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("Easting") === LongType && types("Northing") === LongType)
    assert(types("Longitude") === DoubleType && types("Latitude") === DoubleType)
    assert(types("CreationDateTime") === TimestampType)
    assert(types("RevisionNumber") === LongType)
    assert(df.where(col("CreationDateTime").isNull).count() === 0)
    val s0 = df.where(col("ATCOCode") === "4900002350").head()
    assert(s0.getAs[Long]("Easting") === 519250L)
    assert(math.abs(s0.getAs[Double]("Latitude") - 51.55660) < 1e-9)
  }

  test("catalog is the complete named set; run-by-name dispatches") {
    assert(Catalog.all.keySet === Set("street_manager", "nhs_prescriptions",
      "code_point", "bods_timetables", "naptan"))
    // unknown name is a clear error, not a silent no-op
    intercept[NoSuchElementException] {
      Catalog.run(spark, "not_a_pipeline", "/dev/null", warehouse())
    }
  }
}
