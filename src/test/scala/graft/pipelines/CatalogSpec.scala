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
    assert(df.count() === 8)
    // template order and names (object_data. prefix gone)
    assert(df.columns.take(4).toSeq ===
      Seq("version", "event_reference", "event_type", "event_time"))
    assert(df.columns.contains("work_reference_number") &&
      !df.columns.exists(_.startsWith("object_data")))
    // keys absent from the source null-fill (the street-manager policy)
    assert(df.where(col("town").isNull).count() === 8)
    assert(df.where(col("collaborative_working").isNull).count() === 8)
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
    assert(df.count() === 5)
    assert(df.columns.toSeq === Catalog.codePoint
      .templates("code_point_latest").map(_._1))
    val sw1a = df.where(col("postcode") === "SW1A 1AA").head()
    assert(sw1a.getAs[String]("geometry") === "POINT (529090.0 179645.0)")
    assert(sw1a.getAs[String]("admin_district_code") === "E09000033")
    assert(df.where(col("geometry").startsWith("POINT (")).count() === 5)
  }

  test("bods_timetables: GTFS zip -> one table per recognized member, others skipped") {
    val wh = warehouse()
    val tables = Catalog.run(spark, "bods_timetables", fixture("bods_gtfs.zip"), wh)
    assert(tables.keySet === Set("agency", "routes", "stops", "calendar",
      "trips", "stop_times", "feed_info", "shapes")) // readme.md skipped
    assert(SnapshotTable.read(spark, tables("agency")).count() === 2)
    assert(SnapshotTable.read(spark, tables("stop_times")).count() === 2)
    assert(SnapshotTable.read(spark, tables("feed_info")).count() === 1)
    // shapes joins back to trips on shape_id — the provenance the
    // reference's 9-table set carries and a 7-table load would lose
    assert(SnapshotTable.read(spark, tables("shapes"))
      .join(SnapshotTable.read(spark, tables("trips")), "shape_id")
      .count() === 2)
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

  test("cadent_underground: API CSV -> WKT point + GeoJSON-shape WKT, dirty rows null") {
    val wh = warehouse()
    val tables = Catalog.run(spark, "cadent_underground",
      fixture("cadent_underground.csv"), wh)
    val df = SnapshotTable.read(spark, tables("cadent_underground_pipes"))
    assert(df.count() === 5)
    assert(df.columns.toSeq === Catalog.cadentUnderground
      .templates("cadent_underground_pipes").map(_._1))
    val byId = df.collect().map(r => r.getAs[String]("ASSET_ID") -> r).toMap
    // "lat, lon" -> POINT (lon lat), exactly the reference's Point(lon, lat)
    assert(byId("A0001").getAs[String]("geo_point_wkt") === "POINT (-0.125 51.5)")
    assert(byId("A0001").getAs[String]("geo_shape_wkt") ===
      "LINESTRING (-0.125 51.5, -0.126 51.501)")
    assert(byId("A0002").getAs[String]("geo_shape_wkt") === "POINT (-1.5 52.25)")
    assert(byId("A0003").getAs[String]("geo_shape_wkt") ===
      "POLYGON ((-2.0 53.0, -1.9 53.0, -1.9 53.1, -2.0 53.0))")
    // malformed point + malformed GeoJSON null-fill, never throw
    assert(byId("A0004").getAs[String]("geo_point_wkt") === null)
    assert(byId("A0004").getAs[String]("geo_shape_wkt") === null)
    // Multi* shapes render like the reference's shapely shape().wkt —
    // a network export's MultiLineString must not null out
    assert(byId("A0005").getAs[String]("geo_shape_wkt") ===
      "MULTILINESTRING ((-2.5 53.5, -2.6 53.6), (-2.7 53.7, -2.8 53.8))")
  }

  test("dft_road_stats: one table per ODS file code, per-code sheet + header row") {
    val wh = warehouse()
    // an unknown file code in the same directory is SKIPPED (the
    // reference only ever processes its hand-maintained code map) —
    // never guessed into a null-filled table
    val srcDir = java.nio.file.Files.createTempDirectory("dft-src")
    new java.io.File(fixture("dft_road_stats")).listFiles().foreach { f =>
      java.nio.file.Files.copy(f.toPath, srcDir.resolve(f.getName))
    }
    java.nio.file.Files.copy(srcDir.resolve("rdl0101.ods"),
      srcDir.resolve("rdl9999.ods"))
    val tables = Catalog.run(spark, "dft_road_stats", srcDir.toString, wh)
    assert(tables.keySet === Set("rdl0101", "rdl0202"))
    val r1 = SnapshotTable.read(spark, tables("rdl0101"))
    assert(r1.count() === 2)
    // snake-cased from "Centrally Managed Rural 'A' Roads" etc.
    assert(r1.columns.toSeq === Catalog.dftRoadStats.templates("*").map(_._1))
    val hart = r1.where(col("region") === "Hartlepool").head()
    assert(hart.getAs[String]("total_road_length") === "147.8")
    assert(hart.getAs[String]("ons_area_code") === "E06000001")
    // header at row 7 (0-based 7) for RDL0202a
    val r2 = SnapshotTable.read(spark, tables("rdl0202"))
    assert(r2.count() === 1)
    assert(r2.head().getAs[String]("region") === "England")
  }

  test("geoplace_swa: VelvetSweatshop-encrypted legacy .xls -> cleaned authority names") {
    val dir = java.nio.file.Files.createTempDirectory("geoplace").toString
    val xls = s"$dir/swa.xls"
    graft.sources.TestXls.write(xls, Seq(
      Seq("GeoPlace SWA codes extract", null, null),
      Seq("SWA Code", "Account Name", "Prefix", "Account Type",
        "Registered for Street Manager", "Account Status",
        "Companies House Number", "Previous Company Names",
        "Linked/Parent Company", "Website", "Plant Enquiries",
        "Ofgem Electricity Licence", "Ofgem Gas Licence", "Ofcom Licence",
        "Ofwat Licence", "Company Subsumed By", "SWA Code of New Company"),
      Seq("5990", "CITY OF WESTMINSTER", "AW", "Highway Authority", "Yes",
        "Active", "", "", "", "", "", "", "", "", "", "", ""),
      Seq("1425", "PETERBOROUGH CITY COUNCIL", "PB", "Highway Authority",
        "Yes", "Active", "", "", "", "", "", "", "", "", "", "", ""),
      Seq("7049", "BRIGHTON & HOVE CITY COUNCIL", "BH", "Highway Authority",
        "Yes", "Inactive", "", "", "", "", "", "", "", "", "", "", "")),
      password = Some("VelvetSweatshop"))
    val wh = warehouse()
    val tables = Catalog.run(spark, "geoplace_swa", xls, wh)
    val df = SnapshotTable.read(spark, tables("LATEST_ACTIVE"))
    assert(df.count() === 3)
    assert(df.columns.toSeq === Catalog.geoplaceSwa
      .templates("LATEST_ACTIVE").map(_._1))
    val names = df.select("swa_code", "account_name").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // substring strips: CITY OF -> "", then lower
    assert(names("5990") === "westminster")
    // PETERBOROUGH loses its embedded BOROUGH -> "peter" -> literal fixup
    assert(names("1425") === "peterborough")
    // "&" survives cleaning, then the literal fixup normalizes it
    assert(names("7049") === "brighton and hove")
    assert(df.where(col("date_time_processed").isNull).count() === 0)
  }

  test("national_stat_postcode_lookup: redirect-hub zip -> the NSPL csv, typed") {
    val wh = warehouse()
    val tables = Catalog.run(spark, "national_stat_postcode_lookup",
      fixture("nspl.zip"), wh)
    val df = SnapshotTable.read(spark, tables("national_statistic_postcode_lookup"))
    assert(df.count() === 5)
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("dointr") === LongType && types("imd") === LongType)
    assert(types("lat") === DoubleType && types("long") === DoubleType)
    // blank numerics coerce to NULL (the reference's to_numeric coerce)
    assert(df.where(col("doterm").isNull).count() === 4)
    assert(df.where(col("imd").isNull).count() === 1)
    val r0 = df.where(col("pcd") === "AB1 0A0").head()
    assert(r0.getAs[Long]("dointr") === 198001L)
    assert(math.abs(r0.getAs[Double]("lat") - 57.101) < 1e-12)
  }

  test("built_up_areas: zip -> gpkg -> POLYGON WKT") {
    val wh = warehouse()
    val tables = Catalog.run(spark, "built_up_areas",
      fixture("built_up_areas.zip"), wh)
    val df = SnapshotTable.read(spark, tables("os_open_built_up_areas"))
    assert(df.count() === 2)
    assert(df.columns.toSeq === Catalog.builtUpAreas
      .templates("os_open_built_up_areas").map(_._1))
    val wembley = df.where(col("name1_text") === "Wembley").head()
    assert(wembley.getAs[String]("geometry") ===
      "POLYGON ((519000.0 185000.0, 520000.0 185000.0, 520000.0 186000.0, 519000.0 185000.0))")
    assert(wembley.getAs[String]("areahectares") === "842.5")
  }

  test("os_open_usrn: zip -> gpkg -> LINESTRING WKT + typed usrn") {
    val wh = warehouse()
    val tables = Catalog.run(spark, "os_open_usrn",
      fixture("os_open_usrn.zip"), wh)
    val df = SnapshotTable.read(spark, tables("open_usrns_latest"))
    assert(df.count() === 3)
    assert(df.schema("usrn").dataType === LongType)
    val s = df.where(col("usrn") === 8401426L).head()
    assert(s.getAs[String]("geometry") ===
      "LINESTRING (501251.53 222574.64, 501305.92 222506.65)")
    assert(s.getAs[String]("street_type") === "Designated Street Name")
  }

  test("os_usrn_uprn: zip -> correlation csv, typed identifiers") {
    val wh = warehouse()
    val tables = Catalog.run(spark, "os_usrn_uprn",
      fixture("os_usrn_uprn.zip"), wh)
    val df = SnapshotTable.read(spark,
      tables("os_open_linked_identifiers_uprn_usrn_latest"))
    assert(df.count() === 6)
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("identifier_1") === LongType &&
      types("identifier_2") === LongType && types("version_date_1") === LongType)
    assert(df.where(col("identifier_2") === 8401426L).count() === 2)
  }

  test("ons_uprn_directory: every ONSUD_* region csv unions into one table") {
    val wh = warehouse()
    val tables = Catalog.run(spark, "ons_uprn_directory",
      fixture("ons_uprn_directory.zip"), wh)
    val df = SnapshotTable.read(spark, tables("ons_uprn_directory"))
    assert(df.count() === 5) // 3 EE + 2 LN, readme skipped
    assert(df.schema("uprn").dataType === LongType)
    assert(df.select("rgn24cd").distinct().count() === 2)
  }

  test("post_code_p001/p002: population + household estimate CSVs, typed counts") {
    val wh = warehouse()
    val t1 = Catalog.run(spark, "post_code_p001", fixture("post_code_p001.csv"), wh)
    val p1 = SnapshotTable.read(spark, t1("pcd_p001"))
    assert(p1.count() === 8)
    assert(p1.schema("Count").dataType === LongType)
    assert(p1.where(col("Postcode") === "HA9 6DE")
      .agg(sum("Count")).head().getLong(0) === 230L)
    val t2 = Catalog.run(spark, "post_code_p002", fixture("post_code_p002.csv"), wh)
    val p2 = SnapshotTable.read(spark, t2("pcd_p002"))
    assert(p2.count() === 4)
    assert(p2.schema("Count").dataType === LongType)
  }

  test("bduk_premises: hub page -> discovered region zips -> one table each, BOOLEAN flags") {
    val wh = warehouse()
    val hub = s"file://${fixture("bduk/september-2025/hub.html")}"
    val tables = Catalog.run(spark, "bduk_premises", hub, wh)
    assert(tables.keySet === Set(
      "202509_BDUK_uprn_release_Bduk_East_Region",
      "202509_BDUK_uprn_release_Bduk_West_Midlands"))
    val east = SnapshotTable.read(spark,
      tables("202509_BDUK_uprn_release_Bduk_East_Region"))
    assert(east.count() === 3)
    val types = east.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("uprn") === LongType)
    assert(types("bduk_recognised_premises") === BooleanType)
    assert(types("current_gigabit") === BooleanType)
    assert(east.where(col("current_gigabit")).count() === 2) // i=0,2
    assert(east.head().getAs[String]("region_ons") === "East of England")
    val west = SnapshotTable.read(spark,
      tables("202509_BDUK_uprn_release_Bduk_West_Midlands"))
    assert(west.count() === 2)
    assert(west.where(col("current_gigabit")).count() === 1) // i=1
  }

  test("bduk table naming matches the reference's derivation") {
    assert(Catalog.bdukTableName(
      "https://www.gov.uk/government/publications/x/september-2025-release",
      "https://assets.publishing.service.gov.uk/media/abc/bduk_east_region.zip")
      === "202509_BDUK_uprn_release_Bduk_East_Region")
    // no month segment -> no prefix (the jul-2025 pipeline's bare naming)
    assert(Catalog.bdukTableName("https://example.org/pub",
      "https://example.org/a/North_West1.zip")
      === "BDUK_uprn_release_North_West1")
  }

  test("catalog is the complete named set; run-by-name dispatches") {
    assert(Catalog.all.keySet === Set("street_manager", "nhs_prescriptions",
      "code_point", "bods_timetables", "naptan", "cadent_underground",
      "dft_road_stats", "geoplace_swa", "national_stat_postcode_lookup",
      "built_up_areas", "os_open_usrn", "os_usrn_uprn", "ons_uprn_directory",
      "post_code_p001", "post_code_p002", "bduk_premises"))
    // unknown name is a clear error, not a silent no-op
    intercept[NoSuchElementException] {
      Catalog.run(spark, "not_a_pipeline", "/dev/null", warehouse())
    }
  }
}
