package graft.plans

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftShims

/** Well-Known Binary geometry codec (OGC 06-103r4, a public binary format:
  * endianness byte + uint32 type + IEEE-754 doubles) — covers the geometry
  * payloads inside GeoPackage files WITHOUT GDAL/fiona, which is how the
  * reference ingests OS Built-Up Areas
  * (reference: src/data_processors/built_up_areas.py:80
  * load_geopackage_built_up_areas via fiona; the .gpkg BLOBs it reads are
  * a GeoPackage Binary header followed by standard WKB).
  *
  * Parsed geometries use the same `array<struct<x:double,y:double>>` model
  * as functions.Geo's WKT path, so centroid/distance/containment compose
  * unchanged. Supported: Point, LineString, Polygon (all rings, matching
  * the WKT regex parser), Multi* and GeometryCollection (flattened),
  * either endianness, ISO Z/M and EWKB Z/M/SRID variants (extra
  * dimensions skipped), and a leading GeoPackage Binary header
  * (auto-detected by the 'GP' magic and skipped, envelope included).
  * Malformed input yields NULL, not an exception — engine semantics for
  * dirty ingest data.
  */
object Wkb {

  /** GeoPackage Binary header length (0 when `b` is bare WKB). Layout per
    * the GeoPackage spec: magic 'GP', version, flags, int32 srs_id, then
    * 0/4/6/6/8 envelope doubles per flags bits 1-3. */
  private def headerOffset(b: Array[Byte]): Int =
    if (b.length >= 8 && b(0) == 0x47 && b(1) == 0x50) {
      val env = (b(3) >> 1) & 0x7
      val envDoubles = env match {
        case 1 => 4
        case 2 | 3 => 6
        case 4 => 8
        case _ => 0
      }
      8 + 8 * envDoubles
    } else 0

  private def readPoint(buf: ByteBuffer, extraDims: Int,
                        out: java.util.ArrayList[Double]): Unit = {
    out.add(buf.getDouble())
    out.add(buf.getDouble())
    var i = 0
    while (i < extraDims) { buf.getDouble(); i += 1 }
  }

  private def readGeom(buf: ByteBuffer, out: java.util.ArrayList[Double],
                       depth: Int): Unit = {
    if (depth > 8) throw new IllegalArgumentException("WKB nesting too deep")
    val order = buf.get()
    buf.order(if (order == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val raw = buf.getInt()
    // EWKB high-bit flags, then ISO's +1000/+2000/+3000 dimension coding
    val hasSrid = (raw & 0x20000000) != 0
    var extraDims = (if ((raw & 0x80000000) != 0) 1 else 0) +
      (if ((raw & 0x40000000) != 0) 1 else 0)
    val base0 = raw & 0x1FFFFFFF
    extraDims += (base0 / 1000 match {
      case 1 | 2 => 1
      case 3 => 2
      case _ => 0
    })
    if (hasSrid) buf.getInt()
    base0 % 1000 match {
      case 1 => readPoint(buf, extraDims, out)
      case 2 =>
        val n = buf.getInt()
        var i = 0
        while (i < n) { readPoint(buf, extraDims, out); i += 1 }
      case 3 =>
        val rings = buf.getInt()
        var r = 0
        while (r < rings) {
          val n = buf.getInt()
          var i = 0
          while (i < n) { readPoint(buf, extraDims, out); i += 1 }
          r += 1
        }
      case 4 | 5 | 6 | 7 =>
        val n = buf.getInt()
        var i = 0
        while (i < n) { readGeom(buf, out, depth + 1); i += 1 }
      case _ => throw new IllegalArgumentException(s"WKB type $raw")
    }
  }

  /** bytes -> array<struct<x,y>> ArrayData, or null on malformed input.
    * Called from both the interpreted and generated code paths. */
  def toArrayData(bytes: Array[Byte]): ArrayData =
    try {
      val buf = ByteBuffer.wrap(bytes)
      buf.position(headerOffset(bytes))
      val out = new java.util.ArrayList[Double]()
      readGeom(buf, out, 0)
      val n = out.size() / 2
      val rows = new Array[Any](n)
      var i = 0
      while (i < n) {
        rows(i) = InternalRow(out.get(2 * i), out.get(2 * i + 1))
        i += 1
      }
      new GenericArrayData(rows)
    } catch {
      // malformed/truncated input (IllegalArgument or BufferUnderflow)
      case scala.util.control.NonFatal(_) => null
    }

  /** array<struct<x,y>> -> little-endian WKB of `geomType` (1 = Point
    * using the first vertex, 2 = LineString, 3 = single-shell Polygon). */
  def fromArrayData(arr: ArrayData, geomType: Int): Array[Byte] = {
    val n = arr.numElements()
    // empty geometry or a null vertex: NULL result, matching the parse
    // side's malformed-input contract (the schema says containsNull=false
    // but an upstream array(struct, null) literal can still arrive)
    if (n == 0) return null
    var i = 0
    while (i < n) { if (arr.isNullAt(i)) return null; i += 1 }
    geomType match {
      case 1 =>
        val buf = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
        buf.put(1: Byte).putInt(1)
        val p = arr.getStruct(0, 2)
        buf.putDouble(p.getDouble(0)).putDouble(p.getDouble(1))
        buf.array()
      case 2 | 3 =>
        val ringHdr = if (geomType == 3) 4 else 0
        val buf = ByteBuffer.allocate(9 + ringHdr + 16 * n)
          .order(ByteOrder.LITTLE_ENDIAN)
        buf.put(1: Byte).putInt(geomType)
        if (geomType == 3) buf.putInt(1)
        buf.putInt(n)
        var j = 0
        while (j < n) {
          val p = arr.getStruct(j, 2)
          buf.putDouble(p.getDouble(0)).putDouble(p.getDouble(1))
          j += 1
        }
        buf.array()
      case t => throw new IllegalArgumentException(s"unsupported writer type $t")
    }
  }

  val geomDataType: DataType = ArrayType(StructType(Seq(
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false))), containsNull = false)

  def wkbGeom(bin: Column): Column =
    GraftShims.column(WkbGeom(GraftShims.expression(bin)))

  def wkbWrite(geom: Column, geomType: Int): Column =
    GraftShims.column(WkbWrite(GraftShims.expression(geom), geomType))
}

/** Parse (GeoPackage-)WKB binary into the Geo point-array model. */
case class WkbGeom(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_wkb_geom requires binary, got ${t.catalogString}")
  }

  override def dataType: DataType = Wkb.geomDataType
  override def nullable: Boolean = true // malformed input -> NULL

  override def nullSafeEval(input: Any): Any =
    Wkb.toArrayData(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val r = ctx.freshName("geom")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.plans.Wkb.toArrayData($in);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WkbGeom =
    copy(child = newChild)
}

/** Write the point-array model as little-endian WKB — the construction
  * side of the codec (test fixtures + the q_geo_wkb round-trip). */
case class WkbWrite(child: Expression, geomType: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _) if s.length == 2 &&
      s.forall(_.dataType == DoubleType) && Seq(1, 2, 3).contains(geomType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_wkb_write requires array<struct<x:double,y:double>> and " +
        s"geomType in 1..3, got ${child.dataType.catalogString} / $geomType")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true // empty/null-vertex input -> NULL

  override def nullSafeEval(input: Any): Any =
    Wkb.fromArrayData(input.asInstanceOf[ArrayData], geomType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"""
         |${ev.value} = graft.plans.Wkb.fromArrayData($in, $geomType);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): WkbWrite =
    copy(child = newChild)
}
