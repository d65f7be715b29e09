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
    p002 = landed("pcd_p002"),
    wellbeingSwaCode = "5990") // the fixture authority

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
    // permits -00..-04 and the major work -07 in progress; -03 excluded
    // by its WORK_STOP twin; -06 completed
    assert(byRef.keySet === Set("TSR1591199404915-00", "TSR1591199404915-01",
      "TSR1591199404915-02", "TSR1591199404915-04", "TSR1591199404915-07"))
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
    // (impact_scores_highway_authority_london.sql:88-107): the 5
    // in-progress usrns (incl. major work -07), 8401431 from the
    // completed (WORK_STOP) version of permit -03 — latest event wins
    // per permit — and 8401432 from the completed emergency work -06
    assert(scores.map(_.getAs[String]("usrn")).sorted ===
      Array("8401426", "8401427", "8401428", "8401430", "8401431",
        "8401432", "8401433"))
    scores.foreach { r =>
      val s = r.getAs[Double]("impact_index_score")
      assert(s >= 1.0 && s <= 100.0, s"score $s out of range")
      assert(Set("Low", "Moderate", "High", "Severe", "Minimal")
        .exists(r.getAs[String]("impact_category").startsWith))
    }
  }

  test("the full DAG runs over the landed schemas") {
    // every model materializes without error over the REAL column names
    models.foreach { case (name, df) =>
      val n = df.count()
      assert(n >= 0, name)
    }
  }

  test("wellbeing chain over the landed tables: radius join finds the code-point postcode, £2.10 rule computes") {
    // permit -06: completed immediate_emergency, actual 01-05 -> 01-09
    // (same month: duration = 9-5 = 4 days); its LINESTRING centroid is
    // ~25 m from the landed NW1 1AA code-point row (501300, 222550), so
    // the 500 m radius join attaches that postcode (households 50,
    // population 150) -> 2.10 x 4 x 50 = 420.00
    val em = models("emergency_wellbeing").collect()
    assert(em.length === 1)
    val e = em.head
    assert(e.getAs[String]("permit_reference_number") === "TSR1591199404915-06")
    assert(e.getAs[Long]("duration_days") === 4L)
    assert(e.getAs[Long]("postcode_count") === 1L)
    assert(e.getAs[Long]("total_households_affected") === 50L)
    assert(e.getAs[Long]("total_population_affected") === 150L)
    assert(e.getAs[Double]("wellbeing_total_impact") === 420.0)
    // permit -07: in-progress major -> end = start + 7 days, duration 7
    // -> 2.10 x 7 x 50 = 735.00
    val mj = models("major_wellbeing").collect()
    assert(mj.length === 1)
    val m = mj.head
    assert(m.getAs[String]("permit_reference_number") === "TSR1591199404915-07")
    assert(m.getAs[Long]("duration_days") === 7L)
    assert(m.getAs[Double]("wellbeing_total_impact") === 735.0)
  }

  test("monthly re-land loop: append commit, readChanges touches only the new month's files, model refresh == from-scratch rebuild") {
    // the reference's operating loop: a new month arrives -> re-land ->
    // dbt run. Month 1 is the landed January table re-published as an
    // APPEND commit; month 2 brings new permits (suffixed -M2) plus a
    // WORK_STOP that COMPLETES January's in-progress permit -00.
    val root = java.nio.file.Files
      .createTempDirectory("sm-incr").toString + "/permits"
    val m1 = landed("01_2025")
    val v1 = SnapshotTable.write(m1, root, append = true)
    val newPermits = m1
      .withColumn("permit_reference_number",
        concat(col("permit_reference_number"), lit("-M2")))
      .withColumn("event_reference", col("event_reference") + 1000000L)
      .withColumn("event_time",
        concat(lit("2025-02"), substring(col("event_time"), 8, 100)))
    val stop = m1
      .where(col("permit_reference_number") === "TSR1591199404915-00")
      .orderBy("event_reference").limit(1)
      .withColumn("event_type", lit("WORK_STOP"))
      .withColumn("work_status_ref", lit("completed"))
      .withColumn("event_reference", lit(9999999L))
      .withColumn("event_time", lit("2025-02-20T10:00:00.000Z"))
    val m2 = newPermits.unionByName(stop)
    SnapshotTable.write(m2, root, append = true)

    // (a) incremental consumption reads EXACTLY the new month: row set
    // and input files both disjoint from the month-1 snapshot
    val changes = SnapshotTable.readChanges(spark, root, sinceVersion = v1)
    assert(changes.count() === m2.count())
    val v1Files = SnapshotTable.read(spark, root, Some(v1)).inputFiles.toSet
    assert(changes.inputFiles.nonEmpty &&
      changes.inputFiles.toSet.intersect(v1Files).isEmpty,
      "readChanges rescanned month-1 files")
    assert(changes.where(col("event_reference") === 9999999L).count() === 1)

    // (b) dbt refresh over the appended table == a from-scratch rebuild
    def run(permits: DataFrame): Map[String, DataFrame] =
      Models.streetworksModels(permits,
        landed("open_usrns_latest"), landed("LATEST_ACTIVE"),
        landed("os_open_linked_identifiers_uprn_usrn_latest"),
        landed("code_point_latest"), landed("pcd_p001"), landed("pcd_p002"),
        wellbeingSwaCode = "5990")
    val incremental = run(SnapshotTable.read(spark, root))
    val rebuildRoot = java.nio.file.Files
      .createTempDirectory("sm-rebuild").toString + "/permits"
    SnapshotTable.write(m1.unionByName(m2), rebuildRoot)
    val rebuilt = run(SnapshotTable.read(spark, rebuildRoot))
    for (name <- Seq("in_progress_list_london", "completed_list_london",
        "impact_scores_london", "emergency_wellbeing", "major_wellbeing"))
      assert(incremental(name).collect().toSet ===
        rebuilt(name).collect().toSet, name)

    // the month-2 WORK_STOP moved -00 from in-progress to completed; the
    // -M2 permits joined the in-progress list
    val inRefs = incremental("in_progress_list_london")
      .select("permit_reference_number").collect().map(_.getString(0)).toSet
    assert(!inRefs.contains("TSR1591199404915-00"))
    assert(inRefs.contains("TSR1591199404915-00-M2"))
    val doneRefs = incremental("completed_list_london")
      .select("permit_reference_number").collect().map(_.getString(0)).toSet
    assert(doneRefs.contains("TSR1591199404915-00"))
  }
}
