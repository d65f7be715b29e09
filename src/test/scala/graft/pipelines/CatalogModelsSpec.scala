package graft.pipelines

import graft.SparkSpec
import graft.sinks.SnapshotTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Land → model, end to end: the dbt analytics DAG ([[Models]]) runs
  * over tables LANDED BY THE CATALOG from container-faithful fixtures —
  * the full reference path (ingest pipelines → warehouse tables → dbt
  * models) in one spec, real column names at every seam. */
class CatalogModelsSpec extends SparkSpec {

  private def fixture(name: String): String =
    getClass.getResource(s"/graft/pipelines/$name").getPath

  private lazy val landed: Map[String, DataFrame] = {
    val wh = java.nio.file.Files.createTempDirectory("land-wh").toString
    def land(pipeline: String, input: String): Map[String, DataFrame] =
      Catalog.run(spark, pipeline, input, wh)
        .map { case (t, root) => t -> SnapshotTable.read(spark, root) }
    val xlsDir = java.nio.file.Files.createTempDirectory("land-swa").toString
    graft.sources.TestXls.write(s"$xlsDir/swa.xls", Seq(
      Seq("GeoPlace SWA codes extract"),
      Seq("SWA Code", "Account Name", "Prefix", "Account Type",
        "Registered for Street Manager", "Account Status",
        "Companies House Number", "Previous Company Names",
        "Linked/Parent Company", "Website", "Plant Enquiries",
        "Ofgem Electricity Licence", "Ofgem Gas Licence", "Ofcom Licence",
        "Ofwat Licence", "Company Subsumed By", "SWA Code of New Company"),
      Seq("7049", "BRIGHTON & HOVE CITY COUNCIL", "BH", "Highway Authority",
        "Yes", "Active", "", "", "", "", "", "Yes", "No", "No", "No", "", "")),
      password = Some("VelvetSweatshop"))
    land("street_manager", fixture("street_manager.zip")) ++
      land("os_open_usrn", fixture("os_open_usrn.zip")) ++
      land("geoplace_swa", s"$xlsDir/swa.xls") ++
      land("os_usrn_uprn", fixture("os_usrn_uprn.zip")) ++
      land("code_point", fixture("code_point.gpkg")) ++
      land("post_code_p001", fixture("post_code_p001.csv")) ++
      land("post_code_p002", fixture("post_code_p002.csv"))
  }

  private lazy val models: Map[String, DataFrame] = Models.streetworksModels(
    permits = landed("01_2025"),
    openUsrns = landed("open_usrns_latest"),
    swaCodes = landed("LATEST_ACTIVE"),
    linkedIds = landed("os_open_linked_identifiers_uprn_usrn_latest"),
    codePoint = landed("code_point_latest"),
    p001 = landed("pcd_p001"),
    p002 = landed("pcd_p002"))

  test("uprn_usrn_count over the landed identifier tables") {
    // linked-ids fixture: identifier_2 cycles 8401426/27/28 over 6 rows
    val counts = models("uprn_usrn_count").collect()
      .map(r => r.getAs[Long]("usrn") -> r.getAs[Long]("uprn_count")).toMap
    assert(counts === Map(8401426L -> 2L, 8401427L -> 2L, 8401428L -> 2L))
  }

  test("in_progress_list_london over the landed permit table: exclusion + enrichment") {
    val list = models("in_progress_list_london")
    val byRef = list.collect()
      .map(r => r.getAs[String]("permit_reference_number") -> r).toMap
    // permits -00..-04 in progress; -03 excluded by its WORK_STOP twin
    assert(byRef.keySet === Set("TSR1591199404915-00", "TSR1591199404915-01",
      "TSR1591199404915-02", "TSR1591199404915-04"))
    // usrn 8401426 matched the landed open-usrn geometry + uprn count
    val p0 = byRef("TSR1591199404915-00")
    assert(p0.getAs[String]("geometry") ===
      "LINESTRING (501251.53 222574.64, 501305.92 222506.65)")
    assert(p0.getAs[Long]("uprn_count") === 2L)
    // promoter 7049 matched the decrypted SWA dimension
    assert(p0.getAs[String]("ofgem_electricity_licence") === "Yes")
    // usrn 8401430 (permit -04) has no street/identifier rows: null + 0
    val p4 = byRef("TSR1591199404915-04")
    assert(p4.getAs[String]("geometry") === null)
    assert(p4.getAs[Long]("uprn_count") === 0L)
  }

  test("impact_scores_london over the landed chain: normalized 1-100 per usrn") {
    val scores = models("impact_scores_london").collect()
    // the model scores in-progress UNION ALL completed works
    // (impact_scores_highway_authority_london.sql:88-107): the 4
    // in-progress usrns plus 8401431 from the completed (WORK_STOP)
    // version of permit -03 — latest event wins per permit
    assert(scores.map(_.getAs[String]("usrn")).sorted ===
      Array("8401426", "8401427", "8401428", "8401430", "8401431"))
    scores.foreach { r =>
      val s = r.getAs[Double]("impact_index_score")
      assert(s >= 1.0 && s <= 100.0, s"score $s out of range")
      assert(Set("Low", "Moderate", "High", "Severe", "Minimal")
        .exists(r.getAs[String]("impact_category").startsWith))
    }
  }

  test("the full DAG runs over the landed schemas; wellbeing legs empty but well-formed") {
    // every model materializes without error over the REAL column names
    models.foreach { case (name, df) =>
      val n = df.count()
      assert(n >= 0, name)
    }
    // the fixture has no completed wellbeing-eligible works (no actual
    // dates, swa 5990 not 4720): the wellbeing legs are EMPTY with the
    // full output schema — the land->model contract holds
    val wb = models("emergency_wellbeing")
    assert(wb.isEmpty)
    assert(wb.columns.contains("wellbeing_total_impact"))
  }
}
