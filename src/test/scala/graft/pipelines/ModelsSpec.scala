package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden tests for the dbt-models layer over hand-built REAL-SCHEMA
  * fixtures: every expected number below is computed by hand from the
  * reference model SQL (dbt/street_manager_street_works_analysis/models),
  * so a drift in either the weights, the dedup, the exclusion, the
  * normalisation, or the wellbeing geometry chain fails a named assert.
  * The reference's own data_tests are exercised at the bottom. */
class ModelsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------ street-works fixture
  import ModelsSpec.{Ev, Wv}

  private val westminster = "CITY OF WESTMINSTER" // in Models.londonAuthorities
  private val leeds = "LEEDS CITY COUNCIL"        // not in the list

  private def permits: DataFrame = Seq(
    // P1: in-progress, two event versions — dedup must keep e2 (later time)
    Ev("P1", 1L, "10", "WORK_START", "in_progress", westminster, "SWA1",
      "07", "Standard", "No", "No", Some("road_closure"), "Oxford St", "100"),
    Ev("P1", 2L, "11", "WORK_START", "in_progress", westminster, "SWA1",
      "07", "Major", "Yes", "No", None, "Oxford St", "100"),
    // P2: in-progress AND completed WORK_STOP — excluded from in-progress
    Ev("P2", 3L, "20", "WORK_START", "in_progress", westminster, "SWA1",
      "07", "Major", "Yes", "Yes", Some("contra_flow"), "Oxford St", "100"),
    Ev("P2", 4L, "21", "WORK_STOP", "completed", westminster, "SWA1",
      "07", "Minor", "No", "Yes", Some("give_and_take"), "Oxford St", "100"),
    // P3: completed-only
    Ev("P3", 5L, "30", "WORK_STOP", "completed", westminster, "SWA1",
      "07", "Standard", "No", "No", Some("no_carriageway_incursion"),
      "Baker St", "200"),
    // P4: non-London authority — England lists only
    Ev("P4", 6L, "40", "WORK_START", "in_progress", leeds, "SWA9",
      "99", "Minor", "No", "No", Some("stop_go_boards"), "Briggate", "300"),
    // P5: proposed — excluded everywhere
    Ev("P5", 7L, "50", "WORK_START", "proposed", westminster, "SWA1",
      "07", "Major", "No", "No", Some("road_closure"), "Oxford St", "100"))
    .toDF()
    .withColumn("promoter_organisation", lit("ACME"))
    .withColumn("activity_type", lit("utility"))
    .withColumn("works_location_type", lit("Footway"))
    .withColumn("road_category", lit("3"))
    .withColumn("proposed_start_date", lit("2025-01-01"))
    .withColumn("proposed_end_date", lit("2025-01-31"))
    .withColumn("actual_start_date_time", lit("2025-01-02 00:00:00"))
    .withColumn("actual_end_date_time", lit("2025-01-20 00:00:00"))
    .withColumn("collaborative_working", lit("No"))
    // columns the wellbeing chain filters on (none of these rows are
    // emergency/major works for authority 4720 -> empty wellbeing tables)
    .withColumn("work_category_ref", lit("standard"))
    .withColumn("work_status", lit("Works in progress"))
    .withColumn("works_location_coordinates", lit("POINT (1 1)"))

  private def openUsrns: DataFrame = Seq(
    (100L, "Designated", "POINT (0 0)"),
    (300L, "Numbered", "POINT (800 800)"))
    .toDF("usrn", "street_type", "geometry")

  private def swaCodes: DataFrame = Seq(
    ("7", "Yes", "No", "OF7", "No"))
    .toDF("swa_code", "ofgem_electricity_licence", "ofgem_gas_licence",
      "ofcom_licence", "ofwat_licence")

  private def linkedIds: DataFrame = Seq(
    ("A", 100L), ("B", 100L), ("C", 100L))
    .toDF("correlation_id", "identifier_2")

  private def counts: DataFrame = Models.uprnUsrnCount(openUsrns, linkedIds)

  private def londonLists: (DataFrame, DataFrame) = (
    Models.inProgressList(permits, openUsrns, swaCodes, counts,
      Models.londonAuthorities, correlateOnAuthority = true),
    Models.completedList(permits, openUsrns, swaCodes, counts,
      Models.londonAuthorities))

  test("uprn_usrn_count: linked identifiers counted per USRN, unmatched dropped") {
    val rows = counts.orderBy("usrn").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((100L, 3L)))
  }

  test("in_progress_list_london: dedup picks the later event; P2 excluded by the completed WORK_STOP; dims enrich; uprn_count coalesces") {
    val (inP, _) = londonLists
    val rows = inP.collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[String]("permit_reference_number") === "P1")
    // the DISTINCT ON pick is the LATER event version (e2)
    assert(r.getAs[String]("work_category") === "Major")
    assert(r.getAs[String]("traffic_management_type_ref") === null)
    // dimension joins (usrn geometry, SWA licences via the INT cast, counts)
    assert(r.getAs[String]("geometry") === "POINT (0 0)")
    assert(r.getAs[String]("ofcom_licence") === "OF7")
    assert(r.getAs[Long]("uprn_count") === 3L)
  }

  test("completed_list_london: WORK_STOP rows only; missing dims null / zero-fill") {
    val (_, done) = londonLists
    val rows = done.orderBy("permit_reference_number").collect()
    assert(rows.map(_.getAs[String]("permit_reference_number")).toSeq ===
      Seq("P2", "P3"))
    val p3 = rows(1)
    assert(p3.getAs[String]("geometry") === null)  // usrn 200 not in dim
    assert(p3.getAs[Long]("uprn_count") === 0L)    // COALESCE 0
  }

  test("england lists: no authority filter; uncorrelated exclusion still drops P2; P4 appears") {
    val inE = Models.inProgressList(permits, openUsrns, swaCodes, counts,
      Nil, correlateOnAuthority = false)
    assert(inE.select("permit_reference_number").as[String].collect().sorted
      .toSeq === Seq("P1", "P4"))
    val doneE = Models.completedList(permits, openUsrns, swaCodes, counts)
    assert(doneE.count() === 2)
  }

  test("combinedPermitRowsFromEvents: the fused scale path is row-identical to the list union, with and without authority correlation") {
    val scoring = Seq("usrn", "street_name", "highway_authority",
      "highway_authority_swa_code", "work_category", "is_ttro_required",
      "is_traffic_sensitive", "traffic_management_type_ref", "uprn_count",
      "geometry")
    // P6: in-progress under a LISTED authority, its completed WORK_STOP
    // under an UNLISTED one — the dbt NOT-IN subquery has no authority
    // predicate, so with corr=false the stop must exclude P6 from an
    // authority-filtered list even though the stop event itself is
    // filtered out; this is the combination where an exclusion set built
    // AFTER the authority filter would silently keep the row
    // NULL-ref pair: a NULL join key never matches an anti-join, so the
    // NULL-ref in-progress row survives its NULL-ref stop in the list
    // route — the fused path must not pool NULL refs into one window
    // partition and exclude it
    val crossAuthority = Seq(
      ModelsSpec.Ev("P6", 8L, "60", "WORK_START", "in_progress", westminster,
        "SWA1", "07", "Standard", "No", "No", Some("road_closure"),
        "Oxford St", "100"),
      ModelsSpec.Ev("P6", 9L, "61", "WORK_STOP", "completed", leeds,
        "SWA9", "99", "Standard", "No", "No", Some("road_closure"),
        "Oxford St", "100"),
      ModelsSpec.Ev(null, 10L, "70", "WORK_START", "in_progress",
        westminster, "SWA1", "07", "Minor", "No", "No",
        Some("road_closure"), "Oxford St", "100"),
      ModelsSpec.Ev(null, 11L, "71", "WORK_STOP", "completed", westminster,
        "SWA1", "07", "Minor", "No", "No", Some("road_closure"),
        "Oxford St", "100")).toDF()
    val events = permits.unionByName(crossAuthority,
      allowMissingColumns = true)
    for ((auth, corr) <- Seq(
        (Models.londonAuthorities, true), (Models.londonAuthorities, false),
        (Seq.empty[String], true), (Seq.empty[String], false))) {
      val inP = Models.inProgressList(events, openUsrns, swaCodes, counts,
        auth, correlateOnAuthority = corr)
      val done = Models.completedList(events, openUsrns, swaCodes, counts,
        auth)
      val viaLists = inP.select(scoring.map(col): _*)
        .unionByName(done.select(scoring.map(col): _*))
        .collect().map(_.toSeq).sortBy(_.mkString("|"))
      val fused = Models.combinedPermitRowsFromEvents(events, openUsrns,
        counts, auth, correlateOnAuthority = corr)
        .collect().map(_.toSeq).sortBy(_.mkString("|"))
      assert(fused.toSeq === viaLists.toSeq, s"(auth=$auth corr=$corr)")
      // pin the ground truth itself, not just route agreement: under
      // corr=false the unlisted-authority stop excludes P6; under
      // corr=true it does not
      val inRefs = inP.select("permit_reference_number")
        .as[String].collect().toSet
      assert(inRefs.contains("P6") === corr,
        s"(auth=$auth corr=$corr) in-progress refs: $inRefs")
    }
  }

  test("impactScoresHighwayAuthorityFromEvents ≡ the list route") {
    val (inP, done) = londonLists
    val viaLists = Models.impactScoresHighwayAuthority(inP, done)
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    val fused = Models.impactScoresHighwayAuthorityFromEvents(permits,
      openUsrns, counts, Models.londonAuthorities, correlateOnAuthority = true)
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(fused.toSeq === viaLists.toSeq)
  }

  test("usrn_permit_details: union of both lists with the detail columns") {
    val (inP, done) = londonLists
    val det = Models.usrnPermitDetails(inP, done)
    assert(det.count() === 3)
    assert(det.columns.toSeq.take(4) ===
      Seq("usrn", "street_name", "highway_authority", "permit_reference_number"))
  }

  test("impact_scores (min-max): hand-computed weights, bounds, categories") {
    // weights (deci-points): P1 (Major 50 + ttro 5 + NULL tm 5 + band<=5 2) = 62
    //                        P2 (Minor 10 + sens 5 + medium tm 10 + 2)      = 27
    //                        P3 (Standard 20 + no_carriageway 0 + 2)        = 22
    // usrn 100 total10 = 62+27 = 89; usrn 200 total10 = 22
    // min-max: 1 + 99*(89-22)/67 = 100 (Severe); 1 + 0 = 1 (Minimal)
    val (inP, done) = londonLists
    val scores = Models.impactScores(inP, done)
      .orderBy("usrn").collect()
    assert(scores.length === 2)
    val (u100, u200) = (scores(0), scores(1))
    assert(u100.getAs[String]("usrn") === "100")
    assert(u100.getAs[Double]("total_impact_level") === 8.9)
    assert(u100.getAs[Double]("impact_index_score") === 100.0)
    assert(u100.getAs[String]("impact_category") === "Severe")
    assert(u100.getAs[String]("highway_authority_swa_code") === "swa1") // LOWER
    assert(u200.getAs[Double]("total_impact_level") === 2.2)
    assert(u200.getAs[Double]("impact_index_score") === 1.0)
    assert(u200.getAs[String]("impact_category") === "Minimal")
  }

  test("impact_scores degenerate: all totals equal -> 50.0") {
    val (_, done) = londonLists
    val only3 = done.where(col("permit_reference_number") === "P3")
    val scores = Models.impactScores(only3.limit(0).unionByName(only3), only3)
    // two identical P3 rows -> one group, mx10 == mn10
    assert(scores.select("impact_index_score").as[Double].collect().toSeq ===
      Seq(50.0))
  }

  test("impact_scores_highway_authority: rollup, rank sums, breakdown — hand-computed") {
    val (inP, done) = londonLists
    val rows = Models.impactScoresHighwayAuthority(inP, done).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[String]("highway_authority") === westminster)
    assert(r.getAs[String]("highway_authority_swa_code") === "swa1")
    assert(r.getAs[Long]("total_usrns_count") === 2L)
    assert(r.getAs[Double]("avg_uprn_count") === 1.5)   // (3+0)/2
    assert(r.getAs[Long]("total_uprn_count") === 3L)
    assert(r.getAs[Double]("total_impact_level") === 11.1)
    assert(r.getAs[Double]("avg_impact_level_per_usrn") === 5.55)
    assert(r.getAs[Double]("max_impact_level") === 8.9)
    assert(r.getAs[Double]("min_impact_level") === 2.2)
    // ranks: 22 -> cl 0, 89 -> cl 1; n=2 -> scores 0 and 100
    assert(r.getAs[Double]("total_impact_index_score") === 100.0)
    assert(r.getAs[Double]("avg_impact_index_score") === 50.0)
    // single authority -> percent-rank 0 -> Minimal
    assert(r.getAs[Double]("highway_authority_impact_score") === 0.0)
    assert(r.getAs[String]("impact_category") === "Minimal")
    // breakdown over permit-level rows (P1 Major, P2 Minor, P3 Standard)
    assert(r.getAs[Long]("major_works_count") === 1L)
    assert(r.getAs[Long]("minor_works_count") === 1L)
    assert(r.getAs[Long]("standard_works_count") === 1L)
    assert(r.getAs[Long]("hs2_works_count") === 0L)
    assert(r.getAs[Long]("emergency_works_count") === 0L)
    assert(r.getAs[Long]("ttro_required_count") === 1L)      // P1 Yes
    assert(r.getAs[Long]("traffic_sensitive_count") === 1L)  // P2 Yes
    assert(r.getAs[Long]("high_impact_traffic_mgmt_count") === 0L)
  }

  // --------------------------------------------------- wellbeing fixture

  private def wellbeingPermits: DataFrame = Seq(
    // W1: completed, same start/end month -> duration = 9-5 = 4
    Wv("W1", 1L, "WORK_STOP", "completed", "immediate_urgent", "4720",
      Some("LINESTRING (100 100, 102 102)"),
      Some("2025-01-05 00:00:00"), Some("2025-01-09 00:00:00")),
    // W2: in-progress -> duration 7, end = start + 7 days
    Wv("W2", 2L, "WORK_START", "in_progress", "immediate_emergency", "4720",
      Some("POINT (500 500)"), Some("2025-02-20 00:00:00"), None),
    // W3: completed across months -> duration = day(end) = 3
    Wv("W3", 3L, "WORK_STOP", "completed", "immediate_urgent", "4720",
      Some("POINT (2000 2000)"),
      Some("2024-12-28 00:00:00"), Some("2025-01-03 00:00:00")),
    // W4: in-progress but ALSO completed elsewhere -> excluded
    Wv("W4", 4L, "WORK_START", "in_progress", "immediate_urgent", "4720",
      Some("POINT (100 100)"), Some("2025-03-01 00:00:00"), None),
    Wv("W4", 5L, "WORK_STOP", "completed", "major", "4720",
      Some("POINT (100 100)"),
      Some("2025-03-01 00:00:00"), Some("2025-03-02 00:00:00")),
    // other authority -> excluded by the swa filter
    Wv("W5", 6L, "WORK_STOP", "completed", "immediate_urgent", "9999",
      Some("POINT (100 100)"),
      Some("2025-01-05 00:00:00"), Some("2025-01-06 00:00:00")))
    .toDF()
    .withColumn("promoter_organisation", lit("ACME"))
    .withColumn("promoter_swa_code", lit("07"))
    .withColumn("highway_authority", lit(westminster))
    .withColumn("street_name", lit("Oxford St"))
    .withColumn("activity_type", lit("utility"))
    .withColumn("work_category", lit("Immediate - urgent"))
    .withColumn("work_status", lit("Works in progress"))
    .withColumn("usrn", lit("100"))

  private def codePoint: DataFrame = Seq(
    ("AA1 1AA", "10", "E92000001", "POINT (101 300)"),
    ("AA2 2AA", "10", "E92000001", "POINT (600 600)"),
    ("AA3 3AA", "10", "E92000001", "POINT (5000 5000)"))
    .toDF("postcode", "positional_quality_indicator", "country_code", "geometry")
    .withColumn("nhs_regional_ha_code", lit("Y56"))
    .withColumn("nhs_ha_code", lit("Q71"))
    .withColumn("admin_county_code", lit(""))
    .withColumn("admin_district_code", lit("E09000033"))
    .withColumn("admin_ward_code", lit("E05013806"))

  private def p001: DataFrame = Seq(
    ("AA1 1AA", 1L, "Female", 60L), ("AA1 1AA", 2L, "Male", 40L),
    ("AA2 2AA", 1L, "Female", 10L))
    .toDF("Postcode", "Sex_Code", "Sex_Label", "Count")

  private def p002: DataFrame = Seq(("AA1 1AA", 50L))
    .toDF("Postcode", "Count")

  test("stg works: category/status/swa filters, exclusion, centroid, duration rules") {
    val stg = Models.stgWorksByAuthority(wellbeingPermits,
      Seq("immediate_urgent", "immediate_emergency"), "4720")
    val rows = stg.orderBy("permit_reference_number").collect()
    assert(rows.map(_.getAs[String]("permit_reference_number")).toSeq ===
      Seq("W1", "W2", "W3"))
    val w1 = rows(0)
    assert(w1.getAs[Double]("easting") === 101.0) // LINESTRING centroid
    assert(w1.getAs[Long]("duration_days") === 4L)
    val w2 = rows(1)
    assert(w2.getAs[Long]("duration_days") === 7L)
    assert(w2.getAs[java.sql.Timestamp]("actual_end_date_time").toString
      .startsWith("2025-02-27")) // start + 7 days
    assert(rows(2).getAs[Long]("duration_days") === 3L) // cross-month
  }

  test("int_postcodes: census population/household joins with zero-fill") {
    val pcs = Models.intPostcodes(codePoint, p001, p002)
      .orderBy("postcode").collect()
    assert(pcs.length === 3)
    assert(pcs(0).getAs[Long]("total_population") === 100L)
    assert(pcs(0).getAs[Long]("female_population") === 60L)
    assert(pcs(0).getAs[Long]("male_population") === 40L)
    assert(pcs(0).getAs[Long]("total_households") === 50L)
    assert(pcs(1).getAs[Long]("total_households") === 0L) // no P002 row
    assert(pcs(2).getAs[Long]("total_population") === 0L) // no P001 row
  }

  test("int works postcodes: 500m radius containment, exact distance, unmatched kept") {
    val stg = Models.stgWorksByAuthority(wellbeingPermits,
      Seq("immediate_urgent", "immediate_emergency"), "4720")
    val pcs = Models.intPostcodes(codePoint, p001, p002)
    val wp = Models.intWorksPostcodes(stg, pcs)
    val byPermit = wp.collect().groupBy(_.getAs[String]("permit_reference_number"))
    // W1 (101,101) <-> AA1 1AA (101,300): dist 199
    val w1 = byPermit("W1")
    assert(w1.length === 1 && w1.head.getAs[String]("postcode") === "AA1 1AA")
    assert(w1.head.getAs[Double]("distance_m") === 199.0)
    // W2 (500,500): AA2 2AA at sqrt(2)*100 = 141.4, AA1 1AA at 446.3 —
    // both inside the 500 m radius
    val w2 = byPermit("W2")
    assert(w2.map(_.getAs[String]("postcode")).sorted.toSeq ===
      Seq("AA1 1AA", "AA2 2AA"))
    // W3 (2000,2000): nothing within 500 -> LEFT-join row with null postcode
    val w3 = byPermit("W3")
    assert(w3.length === 1 && w3.head.getAs[String]("postcode") === null)
  }

  test("emergency_wellbeing: £2.10 × days × households, null pass-through on unmatched") {
    val stg = Models.stgWorksByAuthority(wellbeingPermits,
      Seq("immediate_urgent", "immediate_emergency"), "4720")
    val pcs = Models.intPostcodes(codePoint, p001, p002)
    val wb = Models.wellbeingImpact(Models.intWorksPostcodes(stg, pcs), stg)
    val rows = wb.orderBy("permit_reference_number").collect()
    assert(rows.length === 3)
    val w1 = rows(0)
    assert(w1.getAs[Long]("postcode_count") === 1L)
    assert(w1.getAs[Long]("total_population_affected") === 100L)
    assert(w1.getAs[Long]("total_households_affected") === 50L)
    assert(w1.getAs[Double]("wellbeing_total_impact") === 420.0) // 2.10*4*50
    val w2 = rows(1)
    // both postcodes in range: pop 110, households 50+0; 2.10*7*50
    assert(w2.getAs[Long]("postcode_count") === 2L)
    assert(w2.getAs[Long]("total_population_affected") === 110L)
    assert(w2.getAs[Double]("wellbeing_total_impact") === 735.0)
    val w3 = rows(2)
    assert(w3.getAs[Long]("postcode_count") === 0L)
    assert(w3.isNullAt(w3.fieldIndex("wellbeing_total_impact")))
  }

  test("wellbeingByModel: the fused single-pass twin is row-identical to the per-family chains") {
    val families = Seq(
      "emergency_wellbeing" -> Seq("immediate_urgent", "immediate_emergency"),
      "major_wellbeing" -> Seq("major"))
    val pcs = Models.intPostcodes(codePoint, p001, p002)
    val fused = Models.wellbeingByModel(wellbeingPermits, pcs, families, "4720")
    val composed = families.map { case (name, refs) =>
      val stg = Models.stgWorksByAuthority(wellbeingPermits, refs, "4720")
      Models.wellbeingImpact(Models.intWorksPostcodes(stg, pcs), stg)
        .withColumn("model", lit(name))
    }.reduce(_.unionByName(_))
    assert(fused.columns.sorted.toSeq === composed.columns.sorted.toSeq)
    val cols = fused.columns.sorted.map(col)
    assert(fused.select(cols: _*).collect().toSet ===
      composed.select(cols: _*).collect().toSet)
    // both families present: W1/W2/W3 emergency, W4's completed major row
    assert(fused.where(col("model") === "major_wellbeing").count() === 1)
    assert(fused.count() === 4)
    // overlapping family refs are a contract violation, not silent dedup
    intercept[IllegalArgumentException](Models.wellbeingByModel(
      wellbeingPermits, pcs,
      Seq("a" -> Seq("major"), "b" -> Seq("major")), "4720"))
    // empty families fail at the API boundary, not in coalesce()
    intercept[IllegalArgumentException](Models.wellbeingByModel(
      wellbeingPermits, pcs, Seq.empty, "4720"))
  }

  test("streetworksModels: the full dbt DAG by model name") {
    val dag = Models.streetworksModels(permits, openUsrns, swaCodes,
      linkedIds, codePoint, p001, p002)
    assert(dag.keySet === Set("uprn_usrn_count",
      "in_progress_list_london", "completed_list_london",
      "usrn_permit_details_london", "impact_scores_london",
      "impact_scores_highway_authority_london",
      "in_progress_list_england", "completed_list_england",
      "usrn_permit_details_england", "impact_scores_england",
      "impact_scores_highway_authority_england",
      "stg_emergency_works_by_authority", "stg_major_works_by_authority",
      "int_postcodes", "int_emergency_works_postcodes_by_authority",
      "int_major_works_postcodes_by_authority", "emergency_wellbeing",
      "major_wellbeing", "clean_up"))
    // every model materializes (no lazily-broken plan)
    assert(dag("impact_scores_london").count() === 2)
    assert(dag("in_progress_list_england").count() === 2)
    // clean_up carries the two record counts (street-works fixture has no
    // 4720-authority works, so both wellbeing tables are empty here)
    val cu = dag("clean_up").collect().head
    assert(cu.getAs[Long]("emergency_wellbeing_records") === 0L)
    assert(cu.getAs[Long]("major_wellbeing_records") === 0L)
  }

  // ------------------------------------------------------ dbt data tests

  test("duplicatePermitTestCounts: fused key-set counts == testing the built lists (incl. a cross-authority violation)") {
    val camden = "LONDON BOROUGH OF CAMDEN"
    // P6 IS the London violation the fused path must count: in-progress
    // at Westminster with no stop there (survives the correlated
    // exclusion) AND a completed stop at Camden (enters the completed
    // list) -> the permit appears in both London lists
    val withViolation = permits.unionByName(Seq(
      Ev("P6", 8L, "60", "WORK_START", "in_progress", westminster, "SWA1",
        "07", "Standard", "No", "No", Some("road_closure"), "Oxford St", "100"),
      Ev("P6", 9L, "61", "WORK_STOP", "completed", camden, "SWA2",
        "07", "Standard", "No", "No", Some("road_closure"), "Camden Rd", "400"))
      .toDF()
      .withColumn("promoter_organisation", lit("ACME"))
      .withColumn("activity_type", lit("utility"))
      .withColumn("works_location_type", lit("Footway"))
      .withColumn("road_category", lit("3"))
      .withColumn("proposed_start_date", lit("2025-01-01"))
      .withColumn("proposed_end_date", lit("2025-01-31"))
      .withColumn("actual_start_date_time", lit("2025-01-02 00:00:00"))
      .withColumn("actual_end_date_time", lit("2025-01-20 00:00:00"))
      .withColumn("collaborative_working", lit("No"))
      .withColumn("work_category_ref", lit("standard"))
      .withColumn("work_status", lit("Works in progress"))
      .withColumn("works_location_coordinates", lit("POINT (1 1)")))
    for (ev <- Seq(permits, withViolation)) {
      val counts = Models.uprnUsrnCount(openUsrns, linkedIds)
      val fused = Models.duplicatePermitTestCounts(ev,
          Models.londonAuthorities)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val inL = Models.inProgressList(ev, openUsrns, swaCodes, counts,
        Models.londonAuthorities, correlateOnAuthority = true)
      val doneL = Models.completedList(ev, openUsrns, swaCodes, counts,
        Models.londonAuthorities)
      val inE = Models.inProgressList(ev, openUsrns, swaCodes, counts,
        Nil, correlateOnAuthority = false)
      val doneE = Models.completedList(ev, openUsrns, swaCodes, counts, Nil)
      assert(fused("assert_no_duplicate_permits_london") ===
        Models.duplicatePermitsAcrossLists(inL, doneL).count())
      assert(fused("assert_no_duplicate_permits_england") ===
        Models.duplicatePermitsAcrossLists(inE, doneE).count())
      // the single-pass tagged-frame route (dup tests + not_null from
      // ONE cached frame) must agree with BOTH the key-set formulation
      // and the built lists, including the not_null count
      val onePass = Models.dataTestsFromEvents(ev, openUsrns, counts,
          Models.londonAuthorities)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(onePass("assert_no_duplicate_permits_london") ===
        fused("assert_no_duplicate_permits_london"))
      assert(onePass("assert_no_duplicate_permits_england") ===
        fused("assert_no_duplicate_permits_england"))
      assert(onePass("impact_scores_not_null") ===
        Models.impactScoresNotNullViolationCount(inL, doneL)
          .collect().head.getLong(0))
    }
    // and the violation case really is non-zero (the test can fail)
    assert(Models.duplicatePermitTestCounts(withViolation,
        Models.londonAuthorities)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      .apply("assert_no_duplicate_permits_london") === 1L)
    // authorities = Nil is refused (it would freeze the test at 0, not
    // mean 'unfiltered' like the list builders)
    intercept[IllegalArgumentException](
      Models.duplicatePermitTestCounts(permits, Nil))
    intercept[IllegalArgumentException](
      Models.dataTestsFromEvents(permits, openUsrns,
        Models.uprnUsrnCount(openUsrns, linkedIds), Nil))
  }

  test("NULL permit references: no spurious dup-test violation, no double-emit in the radius join, fused wellbeing stays list-identical") {
    val camden = "LONDON BOROUGH OF CAMDEN"
    // a NULL-ref in-progress row at Westminster + a NULL-ref stop at
    // Camden would pool under one groupBy key and read as a London
    // violation — the equi-join route (and the dbt inner-join test)
    // counts 0 because NULL keys never match
    val withNulls = permits.unionByName(Seq(
      Ev(null, 10L, "70", "WORK_START", "in_progress", westminster, "SWA1",
        "07", "Standard", "No", "No", Some("road_closure"), "Oxford St", "100"),
      Ev(null, 11L, "71", "WORK_STOP", "completed", camden, "SWA2",
        "07", "Standard", "No", "No", Some("road_closure"), "Camden Rd", "400"))
      .toDF()
      .withColumn("promoter_organisation", lit("ACME"))
      .withColumn("activity_type", lit("utility"))
      .withColumn("works_location_type", lit("Footway"))
      .withColumn("road_category", lit("3"))
      .withColumn("proposed_start_date", lit("2025-01-01"))
      .withColumn("proposed_end_date", lit("2025-01-31"))
      .withColumn("actual_start_date_time", lit("2025-01-02 00:00:00"))
      .withColumn("actual_end_date_time", lit("2025-01-20 00:00:00"))
      .withColumn("collaborative_working", lit("No"))
      .withColumn("work_category_ref", lit("standard"))
      .withColumn("work_status", lit("Works in progress"))
      .withColumn("works_location_coordinates", lit("POINT (1 1)")))
    val fused = Models.duplicatePermitTestCounts(withNulls,
        Models.londonAuthorities)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fused("assert_no_duplicate_permits_london") === 0L)
    // the tagged-frame route keeps NULL-ref rows for scoring but must
    // drop them from the dup-test membership exactly like the key-set
    // route (and the dbt inner-join test) does
    assert(Models.dataTestsFromEvents(withNulls, openUsrns,
        Models.uprnUsrnCount(openUsrns, linkedIds), Models.londonAuthorities)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      .apply("assert_no_duplicate_permits_london") === 0L)

    // a MATCHED NULL-ref work emits only its matched rows — the anti-join
    // emulation of the dbt LEFT JOIN must not re-add it as an extra
    // all-null-postcode row
    val nullRefWork = Seq(
      Wv(null, 12L, "WORK_STOP", "completed", "immediate_urgent", "4720",
        Some("POINT (100 100)"), // ~200 m from AA1 1AA (101, 300): matched
        Some("2025-01-05 00:00:00"), Some("2025-01-09 00:00:00")))
      .toDF()
      .withColumn("promoter_organisation", lit("ACME"))
      .withColumn("promoter_swa_code", lit("07"))
      .withColumn("highway_authority", lit(westminster))
      .withColumn("street_name", lit("Oxford St"))
      .withColumn("activity_type", lit("utility"))
      .withColumn("work_category", lit("Immediate - urgent"))
      .withColumn("work_status", lit("Works completed"))
      .withColumn("usrn", lit("100"))
    val wvWithNull = wellbeingPermits.unionByName(nullRefWork)
    val stg = Models.stgWorksByAuthority(wvWithNull,
      Seq("immediate_urgent", "immediate_emergency"), "4720")
    val pcs = Models.intPostcodes(codePoint, p001, p002)
    val wp = Models.intWorksPostcodes(stg, pcs)
    // the NULL-ref work at (100,100) matches AA1 1AA (101,300 is 200 m
    // away): exactly ONE row, never a (matched + unmatched) pair
    assert(wp.where(col("permit_reference_number").isNull).count() === 1)
    assert(wp.where(col("permit_reference_number").isNull &&
      col("postcode").isNull).count() === 0)

    // fused wellbeing == per-family chains WITH the NULL-ref row present
    // (both drop it: the composed route at the inner join back to stg)
    val families = Seq(
      "emergency_wellbeing" -> Seq("immediate_urgent", "immediate_emergency"),
      "major_wellbeing" -> Seq("major"))
    val fusedWb = Models.wellbeingByModel(wvWithNull, pcs, families, "4720")
    val composedWb = families.map { case (name, refs) =>
      val s = Models.stgWorksByAuthority(wvWithNull, refs, "4720")
      Models.wellbeingImpact(Models.intWorksPostcodes(s, pcs), s)
        .withColumn("model", lit(name))
    }.reduce(_.unionByName(_))
    val cols = fusedWb.columns.sorted.map(col)
    assert(fusedWb.select(cols: _*).collect().toSet ===
      composedWb.select(cols: _*).collect().toSet)
    assert(fusedWb.where(col("permit_reference_number").isNull).count() === 0)
  }

  test("data test: no duplicate permits between in-progress and completed (clean + broken)") {
    val (inP, done) = londonLists
    assert(Models.duplicatePermitsAcrossLists(inP, done).count() === 0)
    // a deliberately-broken pair IS caught
    val broken = Models.duplicatePermitsAcrossLists(done, done)
    assert(broken.count() > 0)
  }

  test("data test: impact-score not_null columns (clean + broken)") {
    val (inP, done) = londonLists
    val scores = Models.impactScores(inP, done)
    assert(Models.impactScoresNullViolations(scores).count() === 0)
    val withNull = scores.withColumn("total_impact_level",
      when(col("usrn") === "100", lit(null).cast("double"))
        .otherwise(col("total_impact_level")))
    assert(Models.impactScoresNullViolations(withNull).count() === 1)
  }

  test("impactScoresNotNullViolationCount: pre-normalisation count == counting the final frame (constructed nulls)") {
    val (inP, done) = londonLists
    // clean fixture: zero, agreeing with the final-frame formulation
    assert(Models.impactScoresNotNullViolationCount(inP, done)
      .collect().head.getLong(0) === 0L)
    // NULL the uprn_count of one street (a group KEY of the scoring
    // aggregate): the fused count must equal per-column filtering of the
    // FINAL normalised frame — the bijection claim with real violations
    def breakU(df: DataFrame): DataFrame = df.withColumn("uprn_count",
      when(col("usrn") === "100", lit(null).cast("long"))
        .otherwise(col("uprn_count")))
    val fast = Models.impactScoresNotNullViolationCount(
      breakU(inP), breakU(done)).collect().head.getLong(0)
    val finalFrame = Models.impactScores(breakU(inP), breakU(done))
    val perColumn =
      finalFrame.where(col("total_impact_level").isNull).count() +
        finalFrame.where(col("uprn_count").isNull).count()
    assert(fast === perColumn)
    assert(fast > 0L) // the test CAN fail — this is not a SELECT 0
    // and the fused event-level route (what q_model_data_tests runs)
    // agrees with the list route on the clean fixture
    assert(Models.impactScoresNotNullViolationCount(
        Models.combinedPermitRowsFromEvents(permits, openUsrns, counts,
          Models.londonAuthorities, correlateOnAuthority = true))
      .collect().head.getLong(0) === 0L)
  }

  test("finishAuthorityScores: the driver-state guard probes BEFORE materializing and refuses loudly") {
    import org.apache.spark.sql.functions.lit
    // a synthetic USRN-grain frame with 3 distinct authorities; the
    // breakdown columns rawImpactLevel(withBreakdown = true) carries
    val base = Seq(
      ("a1", "s1", "u1", 10L, 50L),
      ("a2", "s2", "u2", 11L, 60L),
      ("a3", "s3", "u3", 12L, 70L))
      .toDF("highway_authority", "highway_authority_swa_code", "usrn",
        "uprn_count", "total10")
    val rawLevel = Seq("major_works_count", "standard_works_count",
      "minor_works_count", "hs2_works_count", "emergency_works_count",
      "ttro_required_count", "traffic_sensitive_count",
      "high_impact_traffic_mgmt_count")
      .foldLeft(base)((d, c) => d.withColumn(c, lit(1L)))
    // over-bound: the guard must fire with the actionable message after
    // shipping at most bound+1 rows (limit-probe), never the full frame
    val e = intercept[IllegalArgumentException] {
      Models.finishAuthorityScores(rawLevel, graft.PersistScope(),
        bound = 2)
    }
    assert(e.getMessage.contains("more than 2 authority rows") &&
      e.getMessage.contains("grouping keys"), e.getMessage)
    // at-bound: same frame, bound 3 — materializes all three authorities
    val ok = Models.finishAuthorityScores(rawLevel, graft.PersistScope(),
      bound = 3)
    assert(ok.count() === 3L)
    assert(ok.columns.contains("highway_authority_impact_score"))
  }
}

object ModelsSpec {
  /** Fixture row shapes (top-level: Dataset encoders need a static outer
    * scope). */
  case class Ev(permit_reference_number: String, event_reference: Long,
      event_time: String, event_type: String, work_status_ref: String,
      highway_authority: String, highway_authority_swa_code: String,
      promoter_swa_code: String, work_category: String,
      is_ttro_required: String, is_traffic_sensitive: String,
      traffic_management_type_ref: Option[String], street_name: String,
      usrn: String)

  case class Wv(permit_reference_number: String, event_reference: Long,
      event_type: String, work_status_ref: String, work_category_ref: String,
      highway_authority_swa_code: String,
      works_location_coordinates: Option[String],
      actual_start_date_time: Option[String],
      actual_end_date_time: Option[String])
}
