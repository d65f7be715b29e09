package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GeoSpec extends SparkSpec {
  import spark.implicits._

  test("stGeomFromText parses POINT and LINESTRING WKT") {
    val df = Seq(
      ("POINT (1.5 2.5)", 1),
      ("LINESTRING (0 0, 10 0, 10 10)", 3),
      ("POLYGON ((0 0, 4 0, 4 4, 0 0))", 4)
    ).toDF("wkt", "expected_n")
    val out = df.select(size(Geo.stGeomFromText(col("wkt"))).as("n"), col("expected_n"))
      .as[(Int, Int)].collect()
    out.foreach { case (n, e) => assert(n === e) }
  }

  test("centroid / stX / stY / distance mirror the reference's spatial chain") {
    // stg_emergency_works_by_authority.sql:24-38: ST_X(ST_Centroid(ST_GeomFromText(...)))
    val df = Seq(Tuple1("LINESTRING (0 0, 10 0, 10 10, 0 10)")).toDF("wkt")
    val c = df.select(Geo.stCentroid(Geo.stGeomFromText(col("wkt"))).as("c"))
    val (x, y) = c.select(Geo.stX(col("c")), Geo.stY(col("c"))).as[(Double, Double)].head()
    assert(x === 5.0 && y === 5.0)

    val d = df.select(Geo.stDistance(
      Geo.stPoint(lit(0), lit(0)), Geo.stPoint(lit(3), lit(4)))).as[Double].head()
    assert(d === 5.0)
  }

  test("withinBuffer is the circular-buffer containment predicate") {
    val df = Seq(Tuple1(1)).toDF("i")
    val in = df.select(Geo.withinBuffer(
      Geo.stPoint(lit(0), lit(0)), Geo.stPoint(lit(300), lit(399)), 500.0)).as[Boolean].head()
    val out = df.select(Geo.withinBuffer(
      Geo.stPoint(lit(0), lit(0)), Geo.stPoint(lit(300), lit(401)), 500.0)).as[Boolean].head()
    assert(in && !out)
  }
}
