package graft.plans

import java.nio.{ByteBuffer, ByteOrder}

import graft.SparkSpec
import graft.functions.Geo
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Absolute byte-level pins for the WKB codec: golden hex vectors for both
  * endiannesses, GeoPackage headers, multi-ring/multi-part flattening,
  * Z/M/SRID variants, and null-on-malformed. The q_geo_wkb oracle checks
  * the distributed round trip against ground truth; these pin the
  * encoding itself. */
class WkbSpec extends SparkSpec {
  import spark.implicits._

  private def parseHex(hex: String): Option[Seq[(Double, Double)]] = {
    val r = Seq(hex).toDF("h")
      .select(Geo.stGeomFromWkb(unhex(col("h"))).as("g")).head()
    if (r.isNullAt(0)) None
    else Some(r.getSeq[Row](0).map(p => (p.getDouble(0), p.getDouble(1))))
  }

  private def parseBytes(b: Array[Byte]): Option[Seq[(Double, Double)]] = {
    val r = Seq(Tuple1(b)).toDF("b")
      .select(Geo.stGeomFromWkb(col("b")).as("g")).head()
    if (r.isNullAt(0)) None
    else Some(r.getSeq[Row](0).map(p => (p.getDouble(0), p.getDouble(1))))
  }

  test("golden little-endian POINT (1 2)") {
    assert(parseHex("0101000000000000000000F03F0000000000000040")
      === Some(Seq((1.0, 2.0))))
  }

  test("golden big-endian POINT (1 2)") {
    assert(parseHex("00000000013FF00000000000004000000000000000")
      === Some(Seq((1.0, 2.0))))
  }

  test("golden little-endian LINESTRING (1 2, 3 4), and the writer emits it") {
    val golden = "010200000002000000000000000000F03F" +
      "000000000000004000000000000008400000000000001040"
    assert(parseHex(golden) === Some(Seq((1.0, 2.0), (3.0, 4.0))))
    val written = Seq(Seq((1.0, 2.0), (3.0, 4.0))).toDF("pts")
      .select(hex(Geo.stAsWkb(
        transform(col("pts"), p => struct(p.getField("_1").as("x"),
          p.getField("_2").as("y"))), 2)).as("h"))
      .head().getString(0)
    assert(written.equalsIgnoreCase(golden))
  }

  test("GeoPackage binary header is auto-detected and skipped (with envelope)") {
    // GPB: magic 'GP', version 0, flags 0x03 (LE ints, envelope code 1 =
    // [minx maxx miny maxy]), srs_id 4326, 4 envelope doubles, then WKB
    val gpb = "47500003" + "E6100000" +
      "000000000000F03F" * 4 +
      "0101000000000000000000F03F0000000000000040"
    assert(parseHex(gpb) === Some(Seq((1.0, 2.0))))
    // and without envelope (flags 0x01)
    val bare = "47500001" + "E6100000" +
      "0101000000000000000000F03F0000000000000040"
    assert(parseHex(bare) === Some(Seq((1.0, 2.0))))
  }

  test("polygon rings and multi-part geometries flatten in order") {
    // POLYGON((0 0, 4 0, 4 4), (1 1, 2 1)) — shell + hole
    val poly = ByteBuffer.allocate(1 + 4 + 4 + (4 + 16 * 3) + (4 + 16 * 2))
      .order(ByteOrder.LITTLE_ENDIAN)
    poly.put(1: Byte).putInt(3).putInt(2)
    poly.putInt(3); Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0))
      .foreach { case (x, y) => poly.putDouble(x).putDouble(y) }
    poly.putInt(2); Seq((1.0, 1.0), (2.0, 1.0))
      .foreach { case (x, y) => poly.putDouble(x).putDouble(y) }
    assert(parseBytes(poly.array())
      === Some(Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (1.0, 1.0), (2.0, 1.0))))

    // MULTIPOLYGON of two single-ring polygons, mixed endianness inside
    val p1 = ByteBuffer.allocate(1 + 4 + 4 + 4 + 16).order(ByteOrder.LITTLE_ENDIAN)
    p1.put(1: Byte).putInt(3).putInt(1).putInt(1).putDouble(5.0).putDouble(6.0)
    val p2 = ByteBuffer.allocate(1 + 4 + 4 + 4 + 16).order(ByteOrder.BIG_ENDIAN)
    p2.put(0: Byte).putInt(3).putInt(1).putInt(1).putDouble(7.0).putDouble(8.0)
    val mp = ByteBuffer.allocate(1 + 4 + 4 + 29 + 29).order(ByteOrder.LITTLE_ENDIAN)
    mp.put(1: Byte).putInt(6).putInt(2).put(p1.array()).put(p2.array())
    assert(parseBytes(mp.array()) === Some(Seq((5.0, 6.0), (7.0, 8.0))))
  }

  test("ISO Z and EWKB SRID variants parse, extra dimensions skipped") {
    // ISO POINT Z (type 1001): x=1 y=2 z=9
    val z = ByteBuffer.allocate(1 + 4 + 24).order(ByteOrder.LITTLE_ENDIAN)
    z.put(1: Byte).putInt(1001).putDouble(1.0).putDouble(2.0).putDouble(9.0)
    assert(parseBytes(z.array()) === Some(Seq((1.0, 2.0))))
    // EWKB point with SRID flag (0x20000001) + srid 4326
    val e = ByteBuffer.allocate(1 + 4 + 4 + 16).order(ByteOrder.LITTLE_ENDIAN)
    e.put(1: Byte).putInt(0x20000001).putInt(4326).putDouble(3.0).putDouble(4.0)
    assert(parseBytes(e.array()) === Some(Seq((3.0, 4.0))))
  }

  test("malformed input yields NULL, not an exception") {
    assert(parseHex("") === None)               // empty
    assert(parseHex("0102000000") === None)     // truncated before count
    assert(parseHex("0163000000") === None)     // unknown type 99
    // truncated mid-coordinates
    assert(parseHex("010200000002000000000000000000F03F") === None)
  }

  test("property: write->parse round-trips arbitrary coordinate lists exactly") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val coord = Gen.chooseNum(-1e6, 1e6).map(v => math.rint(v * 100) / 100)
    val pts = Gen.nonEmptyListOf(Gen.zip(coord, coord)).map(_.take(50))
    val prop = Prop.forAll(pts) { ps =>
      val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        ps.map { case (x, y) =>
          org.apache.spark.sql.catalyst.InternalRow(x, y) }.toArray)
      for (gt <- Seq(2, 3)) { // LineString, single-shell Polygon
        val parsed = Wkb.toArrayData(Wkb.fromArrayData(arr, gt))
        assert(parsed.numElements() == ps.length)
        ps.indices.foreach { i =>
          val p = parsed.getStruct(i, 2)
          assert(p.getDouble(0) == ps(i)._1 && p.getDouble(1) == ps(i)._2)
        }
      }
      true
    }
    val res = check(Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("parse composes with the Geo pipeline (centroid of a written line)") {
    val out = Seq((10.0, 0.0, 20.0, 4.0)).toDF("x1", "y1", "x2", "y2")
      .select(Geo.stAsWkb(array(
        struct(col("x1").as("x"), col("y1").as("y")),
        struct(col("x2").as("x"), col("y2").as("y"))), 2).as("wkb"))
      .select(Geo.stCentroid(Geo.stGeomFromWkb(col("wkb"))).as("c"))
      .select(Geo.stX(col("c")), Geo.stY(col("c"))).head()
    assert(out.getDouble(0) === 15.0 && out.getDouble(1) === 2.0)
  }
}
