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

  test("stGeomFromGeoJson: RFC 7946 shapes == the WKT parse of the same geometry") {
    // cadent_underground.py:252,263-275 — Point/LineString/Polygon GeoJSON
    val df = Seq(
      ("{\"type\":\"Point\",\"coordinates\":[1.5,2.5]}",
        "POINT (1.5 2.5)"),
      ("{\"type\":\"LineString\",\"coordinates\":[[0,0],[10,0],[10,10]]}",
        "LINESTRING (0 0, 10 0, 10 10)"),
      ("{\"type\":\"Polygon\",\"coordinates\":[[[0,0],[4,0],[4,4],[0,0]]]}",
        "POLYGON ((0 0, 4 0, 4 4, 0 0))")
    ).toDF("gj", "wkt")
    val rows = df.select(
        Geo.stGeomFromGeoJson(col("gj")).as("g"),
        Geo.stGeomFromText(col("wkt")).as("w"))
      .as[(Seq[(Double, Double)], Seq[(Double, Double)])].collect()
    rows.foreach { case (g, w) => assert(g === w, "GeoJSON != WKT parse") }
    // polygon keeps only the outer shell (single-shell model, like WKT)
    val hole = "{\"type\":\"Polygon\",\"coordinates\":[[[0,0],[9,0],[9,9],[0,0]],[[1,1],[2,1],[2,2],[1,1]]]}"
    assert(Seq(hole).toDF("gj")
      .select(size(Geo.stGeomFromGeoJson(col("gj")))).as[Int].head() === 4)
    // unknown type / malformed JSON / degenerate coordinate arrays ->
    // NULL, never a throw (ANSI element_at would otherwise kill the job
    // on [] / [5] / short inner pairs)
    val bad = Seq("{\"type\":\"MultiPoint\",\"coordinates\":[[1,2]]}",
      "not json at all", "{\"type\":\"Point\"}",
      "{\"type\":\"Point\",\"coordinates\":[]}",
      "{\"type\":\"Point\",\"coordinates\":[5]}",
      "{\"type\":\"LineString\",\"coordinates\":[[0,0],[1]]}",
      "{\"type\":\"LineString\",\"coordinates\":[]}",
      "{\"type\":\"Polygon\",\"coordinates\":[]}",
      "{\"type\":\"Polygon\",\"coordinates\":[[]]}",
      "{\"type\":\"Polygon\",\"coordinates\":[[[0,0],[9]]]}").toDF("gj")
    assert(bad.select(Geo.stGeomFromGeoJson(col("gj"))).collect()
      .forall(_.isNullAt(0)))
  }

  test("geoJsonToWkt: all six RFC 7946 types render like shapely shape().wkt — Multi* and polygon holes intact") {
    val cases = Seq(
      ("{\"type\":\"Point\",\"coordinates\":[1.5,2.5]}",
        "POINT (1.5 2.5)"),
      ("{\"type\":\"LineString\",\"coordinates\":[[0.5,0.5],[10.5,0.5]]}",
        "LINESTRING (0.5 0.5, 10.5 0.5)"),
      ("{\"type\":\"MultiPoint\",\"coordinates\":[[1.5,2.5],[3.5,4.5]]}",
        "MULTIPOINT ((1.5 2.5), (3.5 4.5))"),
      // polygon with an interior ring — the hole must survive
      ("{\"type\":\"Polygon\",\"coordinates\":[[[0.0,0.0],[9.0,0.0],[9.0,9.0],[0.0,0.0]],[[1.0,1.0],[2.0,1.0],[2.0,2.0],[1.0,1.0]]]}",
        "POLYGON ((0.0 0.0, 9.0 0.0, 9.0 9.0, 0.0 0.0), " +
          "(1.0 1.0, 2.0 1.0, 2.0 2.0, 1.0 1.0))"),
      ("{\"type\":\"MultiLineString\",\"coordinates\":[[[0.5,0.5],[1.5,1.5]],[[2.5,2.5],[3.5,3.5]]]}",
        "MULTILINESTRING ((0.5 0.5, 1.5 1.5), (2.5 2.5, 3.5 3.5))"),
      ("{\"type\":\"MultiPolygon\",\"coordinates\":[[[[0.0,0.0],[4.0,0.0],[4.0,4.0],[0.0,0.0]]],[[[10.0,10.0],[14.0,10.0],[14.0,14.0],[10.0,10.0]],[[11.0,11.0],[12.0,11.0],[12.0,12.0],[11.0,11.0]]]]}",
        "MULTIPOLYGON (((0.0 0.0, 4.0 0.0, 4.0 4.0, 0.0 0.0)), " +
          "((10.0 10.0, 14.0 10.0, 14.0 14.0, 10.0 10.0), " +
          "(11.0 11.0, 12.0 11.0, 12.0 12.0, 11.0 11.0)))"))
    val rows = cases.toDF("gj", "expected")
      .select(Geo.geoJsonToWkt(col("gj")), col("expected"))
      .as[(String, String)].collect()
    rows.foreach { case (got, want) => assert(got === want) }
    // malformed / degenerate / unknown types null, never throw
    val bad = Seq("not json", "{\"type\":\"Point\"}",
      "{\"type\":\"Point\",\"coordinates\":[5]}",
      "{\"type\":\"GeometryCollection\",\"geometries\":[]}",
      "{\"type\":\"MultiPolygon\",\"coordinates\":[[[]]]}",
      "{\"type\":\"MultiLineString\",\"coordinates\":[[[0.0]]]}").toDF("gj")
    assert(bad.select(Geo.geoJsonToWkt(col("gj"))).collect()
      .forall(_.isNullAt(0)))
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

  test("stArea: unit square, winding-independent; degenerate ring is 0") {
    val df = Seq(Tuple1(1)).toDF("i")
    def ring(pts: (Int, Int)*) =
      array(pts.map { case (x, y) => Geo.stPoint(lit(x), lit(y)) }: _*)
    val ccw = df.select(Geo.stArea(ring((0, 0), (1, 0), (1, 1), (0, 1)))).as[Double].head()
    val cw = df.select(Geo.stArea(ring((0, 1), (1, 1), (1, 0), (0, 0)))).as[Double].head()
    assert(ccw == 1.0 && cw == 1.0)
    val tri = df.select(Geo.stArea(ring((0, 0), (4, 0), (0, 3)))).as[Double].head()
    assert(tri == 6.0)
    val line = df.select(Geo.stArea(ring((0, 0), (2, 2), (4, 4)))).as[Double].head()
    assert(line == 0.0)
  }

  test("stLength: 3-4-5 path") {
    val df = Seq(Tuple1(1)).toDF("i")
    val len = df.select(Geo.stLength(array(
      Geo.stPoint(lit(0), lit(0)), Geo.stPoint(lit(3), lit(0)),
      Geo.stPoint(lit(3), lit(4)))))
      .as[Double].head()
    assert(len == 7.0) // 3 + 4; open path, no closing edge
  }

  test("GeoJSON fuzz: 1000 mutated documents — null or valid WKT, never a throw") {
    // the null-or-loud contract of the cadent ingestion path
    // (Catalog's RFC-4180-quoted GeoJSON column, dirty-row-nulls):
    // geoJsonToWkt and stGeomFromGeoJson must NEVER throw (ANSI mode
    // turns an unguarded element_at into a job-killer), and every
    // non-null WKT they do emit must parse back
    val fixtures = Seq(
      """{"type":"Point","coordinates":[1.5,2.5]}""",
      """{"type":"LineString","coordinates":[[0,0],[10,0],[10,10]]}""",
      """{"type":"Polygon","coordinates":[[[0,0],[4,0],[4,4],[0,0]],[[1,1],[2,1],[1,2],[1,1]]]}""",
      """{"type":"MultiPoint","coordinates":[[0,0],[5,5]]}""",
      """{"type":"MultiLineString","coordinates":[[[0,0],[1,1]],[[2,2],[3,3]]]}""",
      """{"type":"MultiPolygon","coordinates":[[[[0,0],[4,0],[4,4],[0,0]]],[[[9,9],[10,9],[9,10],[9,9]]]]}"""
    ).map(_.getBytes("UTF-8"))
    val cases = for {
      (fix, f) <- fixtures.zipWithIndex
      i <- 0 until (1000 / fixtures.size)
    } yield new String(graft.FuzzUtil.mutate(fix, 4217L + f, i), "UTF-8")
    // one batched plan, not 1000 jobs: any per-row throw fails the job
    val out = (cases :+ null).toDF("gj")
      .select(Geo.geoJsonToWkt(col("gj")).as("wkt"),
        Geo.stGeomFromGeoJson(col("gj")).as("g"))
      .collect()
    assert(out.length === cases.length + 1)
    val wktTypes = Seq("POINT (", "LINESTRING (", "MULTIPOINT (",
      "POLYGON (", "MULTILINESTRING (", "MULTIPOLYGON (")
    val nonNull = out.flatMap(r => Option(r.getString(0)))
    nonNull.foreach { w =>
      assert(wktTypes.exists(w.startsWith), s"unrecognized WKT shape: $w")
    }
    // the emitted WKTs round-trip through the WKT parser (same geometry
    // model): parse must yield a non-empty vertex array, not null
    val parsed = nonNull.toSeq.toDF("wkt")
      .select(size(Geo.stGeomFromText(col("wkt")))).as[Int].collect()
    assert(parsed.forall(_ >= 1), "a fuzz-surviving WKT failed to re-parse")
    // sanity: the harness isn't vacuously all-null — the untouched
    // fixtures themselves must all render
    val clean = fixtures.map(new String(_, "UTF-8")).toDF("gj")
      .select(Geo.geoJsonToWkt(col("gj"))).collect()
    assert(clean.forall(_.getString(0) != null))
  }
}
