package graft.spark.gpkg

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{GeoPackageSource, SqliteFile}
import graft.spark.xlsx.SerializableHadoopConf

/** `spark.read.format("graft-gpkg")` — the [[graft.sources.GeoPackageSource]]
  * native SQLite/GeoPackage scan as a first-class DataSource V2 source
  * (reference: src/data_processors/built_up_areas.py:80 reads the OS
  * Built-Up Areas .gpkg via fiona/GDAL):
  *
  *   - one input partition PER B-TREE SUBTREE of the feature table
  *     ([[SqliteFile.Db.subtreeRoots]]) — a multi-GB gpkg scans in
  *     parallel through positioned reads, no task touching the whole file;
  *   - column pruning pushed into the record decode
  *     (`SupportsPushDownRequiredColumns`): unneeded columns are never
  *     converted or materialized into the InternalRow;
  *   - SQLite-affinity typing with the gpkg_geometry_columns override,
  *     identical to the library reader.
  *
  * Options: `table` (defaults to the single gpkg_contents feature table,
  * or the single user table of a plain SQLite file), `partitions`
  * (minimum split count, default = session default parallelism). */
class DefaultSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-gpkg"
  override def supportsExternalMetadata(): Boolean = true

  private def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    val ps = graft.spark.xlsx.XlsxParse.paths(options)
    require(ps.nonEmpty, "graft-gpkg: no path given")
    ps
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val p = paths(options).head
    val db = SqliteFile.open(p, GpkgRead.hadoopConf())
    try {
      val table = Option(options.get("table"))
        .getOrElse(GeoPackageSource.defaultTable(db))
      GeoPackageSource.schemaOf(db, table)._2
    } finally db.close()
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    // resolve the PHYSICAL layout exactly once, from the FIRST file —
    // a folder of monthly releases shares one schema (enforced per file
    // at scan planning); `schema` may be a user-supplied
    // reordering/subset/retyping and binds BY NAME below
    val ps = paths(opts)
    val db = SqliteFile.open(ps.head, GpkgRead.hadoopConf())
    val (table, phys, ipk) =
      try {
        val t = Option(opts.get("table"))
          .getOrElse(GeoPackageSource.defaultTable(db))
        val (info, st) = GeoPackageSource.schemaOf(db, t)
        (t, st, info.ipk)
      } finally db.close()
    schema.fieldNames.foreach { n =>
      require(phys.fieldNames.contains(n),
        s"graft-gpkg: column '$n' does not exist in ${ps.head}#$table " +
          s"(has: ${phys.fieldNames.mkString(", ")})")
    }
    GpkgTable(schema, ps, table, opts.getInt("partitions", 0), phys, ipk)
  }
}

case class GpkgTable(tableSchema: StructType, paths: Seq[String], table: String,
                     minPartitions: Int, phys: StructType, ipk: Option[Int])
    extends Table with SupportsRead {
  override def schema(): StructType = tableSchema
  override def name(): String = s"${paths.mkString(",")}#$table"
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GpkgScanBuilder(this)
}

class GpkgScanBuilder(t: GpkgTable)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = t.tableSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = GpkgScan(t, required)
}

case class GpkgInputPartition(path: String, rootPage: Int) extends InputPartition

case class GpkgScan(t: GpkgTable, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-gpkg ${t.name()} cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val target = math.max(t.minPartitions, org.apache.spark.sql.SparkSession
      .active.sparkContext.defaultParallelism)
    val perFile = math.max(1, target / t.paths.size)
    t.paths.flatMap { p =>
      val db = SqliteFile.open(p, GpkgRead.hadoopConf())
      try {
        // layout must match the first file EXACTLY: names, mapped types
        // (a REAL column where the first file declared INTEGER would be
        // silently truncated by the Long coercion), and the rowid-alias
        // column (a name-only check would substitute rowids into the
        // wrong column). schemaOf also re-checks the table exists.
        val (info, st) = GeoPackageSource.schemaOf(db, t.table)
        require(info.columns.map(_.name) == t.phys.fieldNames.toVector &&
            st == t.phys && info.ipk == t.ipk,
          s"graft-gpkg: $p#${t.table} column layout differs from ${t.paths.head}")
        db.subtreeRoots(info.rootPage, perFile)
          .map(r => GpkgInputPartition(p, r): InputPartition)
      } finally db.close()
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GpkgReaderFactory(t.phys.fieldNames.toVector,
      // (physical index, requested output type) per required column —
      // binding BY NAME so user-supplied column order/subset/retype is safe
      required.fields.toVector.map(f =>
        (t.phys.fieldIndex(f.name), f.dataType)),
      t.ipk, new SerializableHadoopConf(GpkgRead.hadoopConf()))
}

case class GpkgReaderFactory(physNames: Vector[String],
                             cols: Vector[(Int, DataType)], ipk: Option[Int],
                             conf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val gp = partition.asInstanceOf[GpkgInputPartition]
    val root = gp.rootPage
    new PartitionReader[InternalRow] {
      private val db = SqliteFile.open(gp.path, conf.value)
      private val it = db.rows(root)
      private var row: InternalRow = _

      override def next(): Boolean =
        if (!it.hasNext) false
        else {
          val (rowid, raw) = it.next()
          val vals = raw.padTo(physNames.size, null)
          // only the REQUIRED columns are coerced and materialized
          row = InternalRow.fromSeq(cols.map { case (i, dt) =>
            val v = if (ipk.contains(i)) rowid else vals(i)
            GeoPackageSource.coerce(v, dt) match {
              case null => null
              case s: String => UTF8String.fromString(s)
              case x => x
            }
          })
          true
        }

      override def get(): InternalRow = row
      override def close(): Unit = db.close()
    }
  }
}

private[gpkg] object GpkgRead {
  def hadoopConf(): org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())
}
