package graft.pipelines

import java.sql.Timestamp

import graft.SparkSpec
import graft.sinks.SnapshotTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end SCD-type-2 spec: two monthly Section 58 loads through
  * [[Section58.run]], asserting the version close/open rows in the
  * dimension table — the reference's staging_section_58 →
  * dim_section_58 warehouse pattern (section_58.py get_scd_sql). */
class Section58Spec extends SparkSpec {

  private def fixture(name: String): String =
    getClass.getResource(s"/graft/pipelines/$name").getPath

  private val t1 = Timestamp.valueOf("2025-02-01 00:00:00")
  private val t2 = Timestamp.valueOf("2025-03-01 00:00:00")
  private val open = Timestamp.valueOf("9999-12-31 00:00:00")

  test("two monthly loads: initial open versions, then close/open on newer events only") {
    val wh = java.nio.file.Files.createTempDirectory("s58-wh").toString

    // ---- month 1: initial load
    val roots = Section58.run(spark, fixture("section_58_2025_01.zip"), wh, t1)
    val dim1 = SnapshotTable.read(spark, roots("dim_section_58")).collect()
      .map(r => r.getAs[String]("section_58_reference_number") -> r).toMap
    // PERMIT event filtered; duplicate-A load deduped to the newest event
    assert(dim1.keySet === Set("S58-A", "S58-B"))
    val a1 = dim1("S58-A")
    assert(a1.getAs[String]("status") === "in force") // event 1002 wins rn=1
    assert(a1.getAs[Timestamp]("valid_from") === t1)
    assert(a1.getAs[Timestamp]("valid_to") === open)
    assert(a1.getAs[Boolean]("is_current"))
    assert(a1.getAs[java.sql.Date]("start_date") ===
      java.sql.Date.valueOf("2025-01-01"))
    // surrogate keys are 1..n in reference order on the first load
    assert(Seq(dim1("S58-A"), dim1("S58-B"))
      .map(_.getAs[Int]("surrogate_key")) === Seq(1, 2))

    // staging carries the month's raw events (PERMIT row included — the
    // object filter is the DIM's, staging is the raw landing zone)
    val stg1 = SnapshotTable.read(spark, roots("staging_section_58"))
    assert(stg1.count() === 4)
    assert(stg1.schema("event_reference").dataType === LongType)
    assert(stg1.schema("version").dataType === IntegerType)

    // ---- month 2: close/open A, skip replayed B, open C
    Section58.run(spark, fixture("section_58_2025_02.zip"), wh, t2)
    val dimRoot = roots("dim_section_58")
    val dim2 = SnapshotTable.read(spark, dimRoot)
    assert(dim2.count() === 4)

    val aRows = dim2.where(col("section_58_reference_number") === "S58-A")
      .orderBy("surrogate_key").collect()
    assert(aRows.length === 2)
    val (aClosed, aOpen) = (aRows(0), aRows(1))
    assert(aClosed.getAs[Boolean]("is_current") === false)
    assert(aClosed.getAs[Timestamp]("valid_to") === t2)
    assert(aClosed.getAs[String]("status") === "in force")
    assert(aOpen.getAs[Boolean]("is_current"))
    assert(aOpen.getAs[String]("status") === "restriction lifted")
    assert(aOpen.getAs[Timestamp]("valid_from") === t2)
    assert(aOpen.getAs[Timestamp]("valid_to") === open)
    // record_hash versions with the attributes
    assert(aClosed.getAs[String]("record_hash") !==
      aOpen.getAs[String]("record_hash"))

    // B: replayed (not newer) event -> untouched, still the t1 version
    val b = dim2.where(col("section_58_reference_number") === "S58-B").head()
    assert(b.getAs[Boolean]("is_current"))
    assert(b.getAs[Timestamp]("valid_from") === t1)
    assert(b.getAs[Timestamp]("valid_to") === open)

    // C: brand new -> opened at t2; keys continue from the old max
    val c = dim2.where(col("section_58_reference_number") === "S58-C").head()
    assert(c.getAs[Boolean]("is_current"))
    assert(c.getAs[Timestamp]("valid_from") === t2)
    // insert delta ordered by ref: A-v2 = 3, C = 4
    assert(aOpen.getAs[Int]("surrogate_key") === 3)
    assert(c.getAs[Int]("surrogate_key") === 4)

    // exactly one current row per restriction — the reference's
    // uniqueness data-test on the dimension
    val dupCurrent = dim2.where(col("is_current"))
      .groupBy("section_58_reference_number").count()
      .where(col("count") > 1)
    assert(dupCurrent.isEmpty)

    // staging was CLEARED between loads (TRUNCATE semantics)
    assert(SnapshotTable.read(spark, roots("staging_section_58")).count() === 3)

    // the dim advances as SnapshotTable versions: month-1 state is still
    // readable (time travel), month-2 is latest
    val vs = SnapshotTable.versions(spark, dimRoot)
    assert(vs.size === 2)
    assert(SnapshotTable.read(spark, dimRoot, Some(vs.head)).count() === 2)
  }

  test("applyScd2: a NULL-event_time current version never gains a duplicate open row") {
    // month 1 lands an unparseable event_time -> the dim's only version
    // for the key carries event_time NULL. Month 2 replays the key: the
    // reference's NOT EXISTS inserts nothing (the key exists), and the
    // close predicate is NULL — the dim must stay at exactly ONE current
    // row. A presence check built on max(event_time) IS NULL would
    // insert a second forever-open version here.
    import spark.implicits._
    def staging(rows: (String, Long, String)*) =
      rows.toDF("section_58_reference_number", "event_reference",
          "event_time")
        .withColumn("object_type", lit("SECTION_58"))
        .withColumn("usrn", lit("100"))
        .withColumn("section_58_status", lit("in force"))
        .withColumn("start_date", lit("2025-01-01"))
        .withColumn("end_date", lit("2025-06-01"))
        .withColumn("section_58_duration", lit("5 months"))
        .withColumn("section_58_extent", lit("Whole street"))
        .withColumn("section_58_location_type", lit("Footway"))
        .withColumn("section_58_coordinates", lit("POINT (1 1)"))
        .withColumn("status_change_date", lit("2025-01-01 00:00:00"))
        .withColumn("highway_authority_swa_code", lit("5990"))
        .withColumn("highway_authority", lit("CITY OF WESTMINSTER"))
        .withColumn("street_name", lit("Oxford St"))
        .withColumn("area_name", lit("Westminster"))
        .withColumn("town", lit("London"))
        .withColumn("event_type", lit("SECTION_58_IN_FORCE"))
    val dim1 = Section58.applyScd2(None,
      staging(("S58-N", 1L, "not-a-timestamp")), t1)
    assert(dim1.count() === 1)
    assert(dim1.head().getAs[java.sql.Timestamp]("event_time") === null)
    val dim2 = Section58.applyScd2(Some(dim1),
      staging(("S58-N", 2L, "not-a-timestamp-either")), t2)
    val rows = dim2.collect()
    assert(rows.length === 1, s"duplicate open version: ${rows.toSeq}")
    assert(rows.head.getAs[Boolean]("is_current"))
    // a brand-new key in the same load still inserts
    val dim3 = Section58.applyScd2(Some(dim1),
      staging(("S58-N", 3L, "junk"), ("S58-NEW", 4L, "junk")), t2)
    assert(dim3.count() === 2)
    assert(dim3.where(col("section_58_reference_number") === "S58-NEW")
      .head().getAs[Boolean]("is_current"))
  }
}
