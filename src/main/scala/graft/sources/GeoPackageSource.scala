package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** GeoPackage (`.gpkg`) ingestion as a partitioned Spark scan — the
  * container half of the reference's Built-Up Areas load (reference:
  * src/data_processors/built_up_areas.py:80 reads the OS .gpkg with
  * fiona/GDAL; [[graft.plans.Wkb]] already covers the geometry payloads).
  * A GeoPackage is a SQLite file, so this rides [[SqliteFile]]: the
  * driver reads only the schema pages, then each Spark partition walks
  * one independent subtree of the feature table's B-tree through
  * positioned reads — a multi-GB gpkg scans in parallel with no task
  * touching the whole file, and many-file ingestion parallelizes per
  * file like every other staged source.
  *
  * Typing follows SQLite column affinity (INT -> long, TEXT -> string,
  * REAL -> double, BLOB -> binary, NUMERIC e.g. DATETIME -> string),
  * EXCEPT that geometry columns are forced to binary via
  * `gpkg_geometry_columns` — the spec-correct route, and necessary
  * because a gpkg declares geometry columns by geometry type name
  * ("POINT" contains "INT" and would otherwise affinity-match INTEGER).
  * INTEGER PRIMARY KEY columns surface the rowid, as SQLite defines.
  */
object GeoPackageSource {

  /** SQLite column-affinity rules (file-format spec §3.1) -> Spark type. */
  private[sources] def affinity(decl: String): DataType = {
    val d = decl.toUpperCase
    if (d.contains("INT")) LongType
    else if (d.contains("CHAR") || d.contains("CLOB") || d.contains("TEXT")) StringType
    else if (d.isEmpty || d.contains("BLOB")) BinaryType
    else if (d.contains("REAL") || d.contains("FLOA") || d.contains("DOUB")) DoubleType
    else StringType // NUMERIC affinity (DATETIME, BOOLEAN, DECIMAL, ...) — surfaced textually
  }

  private[graft] def coerce(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (l: Long, LongType) => l
    case (l: Long, DoubleType) => l.toDouble
    case (l: Long, StringType) => l.toString
    case (d: Double, DoubleType) => d
    case (d: Double, LongType) => d.toLong
    case (d: Double, StringType) => d.toString
    case (s: String, StringType) => s
    case (s: String, LongType) => s.toLongOption.orNull
    case (s: String, DoubleType) => s.toDoubleOption.orNull
    case (s: String, BinaryType) => s.getBytes(StandardCharsets.UTF_8)
    case (b: Array[Byte], BinaryType) => b
    case (b: Array[Byte], StringType) => new String(b, StandardCharsets.UTF_8)
    case (_, _) => null // affinity-impossible pairing: filter-don't-fail
  }

  /** Columns of `table` declared geometric in gpkg_geometry_columns
    * (empty for a plain SQLite file or a non-feature table). */
  private def geometryColumns(db: SqliteFile.Db, table: String): Set[String] =
    db.tables().find(_.name == "gpkg_geometry_columns") match {
      case None => Set.empty
      case Some(gc) =>
        val tIdx = gc.columns.indexWhere(_.name == "table_name")
        val cIdx = gc.columns.indexWhere(_.name == "column_name")
        db.rows(gc.rootPage).collect {
          case (_, vals) if vals.lift(tIdx).contains(table) =>
            vals(cIdx).asInstanceOf[String]
        }.toSet
    }

  /** Table names + declared columns, driver-side (schema pages only). */
  def tables(path: String): Vector[SqliteFile.TableInfo] = {
    val db = SqliteFile.open(path)
    try db.tables() finally db.close()
  }

  /** Resolved (table info, Spark schema) with the geometry override
    * applied — shared by the library reader and the DSv2 connector. */
  private[graft] def schemaOf(db: SqliteFile.Db,
                              table: String): (SqliteFile.TableInfo, StructType) = {
    val info = db.table(table)
    val geom = geometryColumns(db, table)
    val fields = info.columns.map { c =>
      val dt = if (geom.contains(c.name)) BinaryType else affinity(c.declType)
      StructField(c.name, dt)
    }
    (info, StructType(fields))
  }

  /** The table a bare `.load(path)` means: the single gpkg_contents
    * feature entry, else the single user table of a plain SQLite file. */
  private[graft] def defaultTable(db: SqliteFile.Db): String = {
    val ts = db.tables()
    val features = ts.find(_.name == "gpkg_contents").toSeq.flatMap { gc =>
      val tIdx = gc.columns.indexWhere(_.name == "table_name")
      val dIdx = gc.columns.indexWhere(_.name == "data_type")
      db.rows(gc.rootPage).collect {
        case (_, vals) if vals.lift(dIdx).contains("features") =>
          vals(tIdx).asInstanceOf[String]
      }.toSeq
    }
    val candidates =
      if (features.nonEmpty) features
      else ts.map(_.name).filterNot(n =>
        n.startsWith("gpkg_") || n.startsWith("sqlite_"))
    candidates match {
      case Seq(one) => one
      case Seq() => sys.error( // tiles-only / metadata-only package
        "graft-gpkg: no feature or user table found — " +
          "pass .option(\"table\", ...) naming one explicitly")
      case many => sys.error(
        s"graft-gpkg: ambiguous table — pass .option(\"table\", ...); candidates: ${many.mkString(", ")}")
    }
  }

  /** Everything the distributed read needs, resolved in ONE driver-side
    * open (schema, partition subtree roots, geometry columns) — readTable
    * and readFeatures share it so a feature read doesn't open and
    * schema-parse the file twice. */
  private case class Resolved(schema: StructType, roots: Vector[Int],
      ipk: Option[Int], types: Vector[DataType], geom: Set[String],
      serConf: graft.spark.xlsx.SerializableHadoopConf)

  private def resolve(spark: SparkSession, path: String, table: String,
                      minPartitions: Int): Resolved = {
    // session Hadoop conf both sides: spark.hadoop.* (credentials,
    // filesystem impls) must reach the positioned reads on the executors
    val hconf = spark.sessionState.newHadoopConf()
    val serConf = new graft.spark.xlsx.SerializableHadoopConf(hconf)
    val db = SqliteFile.open(path, hconf)
    try {
      val (info, st) = schemaOf(db, table)
      val target = math.max(minPartitions, spark.sparkContext.defaultParallelism)
      Resolved(st, db.subtreeRoots(info.rootPage, target), info.ipk,
        st.fields.toVector.map(_.dataType), geometryColumns(db, table),
        serConf)
    } finally db.close()
  }

  /** Scan one table of a SQLite/GeoPackage file as a DataFrame. Partition
    * count ≈ max(minPartitions, defaultParallelism), bounded by the
    * table's B-tree fan-out — each partition walks one subtree. */
  def readTable(spark: SparkSession, path: String, table: String,
                minPartitions: Int = 0): DataFrame =
    distributedRead(spark, path, resolve(spark, path, table, minPartitions))

  private def distributedRead(spark: SparkSession, path: String,
                              r: Resolved): DataFrame = {
    val Resolved(schema, roots, ipk, types, _, serConf) = r
    val nCols = types.size
    val rdd = spark.sparkContext
      .parallelize(roots, math.max(roots.size, 1))
      .flatMap { root =>
        val edb = SqliteFile.open(path, serConf.value)
        Option(TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => edb.close()))
        edb.rows(root).map { case (rowid, raw) =>
          val vals = raw.padTo(nCols, null) // rows predating ALTER TABLE ADD COLUMN
          Row.fromSeq((0 until nCols).map { i =>
            if (ipk.contains(i)) rowid // INTEGER PRIMARY KEY aliases the rowid
            else coerce(vals(i), types(i))
          })
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** The gpkg_contents directory — which tables hold features. */
  def contents(spark: SparkSession, path: String): DataFrame =
    readTable(spark, path, "gpkg_contents")

  /** Feature read with every geometry column ALSO parsed to the engine's
    * array<struct<x,y>> model via the native WKB decoder (`<col>_xy`);
    * the raw GeoPackage-binary column stays for round-tripping. */
  def readFeatures(spark: SparkSession, path: String, table: String,
                   minPartitions: Int = 0): DataFrame = {
    val r = resolve(spark, path, table, minPartitions)
    // sorted: a Set fold would append the _xy columns in hash order,
    // making the output column order vary across runs/Scala versions
    r.geom.toSeq.sorted
      .foldLeft(distributedRead(spark, path, r)) { (df, g) =>
        df.withColumn(s"${g}_xy", graft.functions.Geo.stGeomFromWkb(col(g)))
      }
  }
}
