package graft.spark.xlsx

import java.util.zip.ZipOutputStream

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType

import graft.sinks.WorkbookStream

/** The write half of the `graft-xlsx` DSv2 connector:
  * `df.write.format("graft-xlsx").mode("append"|"overwrite").save(dir)`.
  *
  * One workbook per partition, streamed by the same [[WorkbookStream]]
  * the foreachPartition sink uses, under the standard two-phase commit:
  * each task writes `_temporary-<queryId>/part-<pid>-<taskId>.xlsx` and
  * reports it in its commit message; only the driver-side job commit
  * renames committed files to their final `part-NNNNN.xlsx` names and
  * drops the temp dir — speculative or failed attempts never surface a
  * partial workbook (same atomicity contract as sources.Fetch's
  * temp+move). `overwrite` (SupportsTruncate) deletes the previous
  * `part-*.xlsx` generation inside the same job commit.
  *
  * Values of any type are rendered through the Catalyst-to-Scala
  * converter (timestamps/dates/decimals print their external Scala
  * form, exactly like the Row-based sink), nulls become gap cells, so a
  * written folder round-trips through the all-string read path.
  */
class XlsxWriteBuilder(schema: StructType, dir: String, queryId: String)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      XlsxBatchWrite(schema, dir, doTruncate, queryId)
  }
}

case class XlsxCommit(partitionId: Int, tempPath: String)
    extends WriterCommitMessage

case class XlsxBatchWrite(schema: StructType, dir: String,
                          truncate: Boolean, queryId: String)
    extends BatchWrite {

  private def tempDirName = s"_temporary-$queryId"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    XlsxWriterFactory(schema, dir, tempDirName,
      new SerializableHadoopConf(XlsxParse.sessionHadoopConf()))

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val d = new Path(dir)
    val fs = d.getFileSystem(XlsxParse.sessionHadoopConf())
    if (truncate && fs.exists(d))
      fs.listStatus(d).map(_.getPath)
        .filter(p => p.getName.startsWith("part-") && p.getName.endsWith(".xlsx"))
        .foreach(fs.delete(_, false))
    messages.foreach {
      case XlsxCommit(_, null) => // empty partition: no file was opened
      case XlsxCommit(pid, tmp) =>
        // append mode gets query-unique part names: a plain part-<pid>
        // would delete-and-replace an EARLIER append's workbook with the
        // same partition id (mode("append") silently destroying data);
        // truncate mode just cleared the directory, so plain names are
        // fine there and keep the familiar layout. FULL queryId: an
        // 8-char prefix reaches ~1% collision odds after ~9k appends to
        // one long-lived directory, and the delete below would then
        // remove an earlier query's committed workbook
        val dst =
          if (truncate) new Path(d, f"part-$pid%05d.xlsx")
          else new Path(d, f"part-$pid%05d-$queryId.xlsx")
        fs.delete(dst, false) // idempotent re-commit of THIS query only
        if (!fs.rename(new Path(tmp), dst))
          sys.error(s"graft-xlsx: commit rename $tmp -> $dst failed")
      case other => sys.error(s"graft-xlsx: unexpected commit message $other")
    }
    fs.delete(new Path(d, tempDirName), true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val d = new Path(dir)
    val fs = d.getFileSystem(XlsxParse.sessionHadoopConf())
    fs.delete(new Path(d, tempDirName), true)
  }
}

case class XlsxWriterFactory(schema: StructType, dir: String,
                             tempDirName: String,
                             conf: SerializableHadoopConf)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new XlsxDataWriter(schema, dir, tempDirName, partitionId, taskId, conf)
}

/** Task-side writer: opens its temp workbook lazily on the first row
  * (empty partitions emit no file, matching the sink), streams each row
  * as inline strings, and hands the temp path to the driver on commit. */
class XlsxDataWriter(schema: StructType, dir: String, tempDirName: String,
                     partitionId: Int, taskId: Long,
                     conf: SerializableHadoopConf)
    extends DataWriter[InternalRow] {

  private val tmpPath =
    new Path(new Path(dir, tempDirName), f"part-$partitionId%05d-$taskId.xlsx")
  private val toScala =
    schema.fields.map(f => GraftShims.toScalaConverter(f.dataType))
  private var zos: ZipOutputStream = null
  private var wb: WorkbookStream = null

  override def write(row: InternalRow): Unit = {
    if (wb == null) {
      val fs = tmpPath.getFileSystem(conf.value)
      zos = new ZipOutputStream(fs.create(tmpPath, true))
      wb = new WorkbookStream(zos, schema.fieldNames.toSeq)
    }
    wb.writeRow((0 until schema.length).map { i =>
      if (row.isNullAt(i)) None
      else Option(toScala(i)(row.get(i, schema(i).dataType))).map(_.toString)
    })
  }

  override def commit(): WriterCommitMessage = {
    if (wb != null) { wb.finish(); zos.close(); zos = null }
    XlsxCommit(partitionId, if (wb == null) null else tmpPath.toString)
  }

  override def abort(): Unit = {
    if (zos != null) { zos.close(); zos = null }
    val fs = tmpPath.getFileSystem(conf.value)
    fs.delete(tmpPath, false)
  }

  override def close(): Unit =
    if (zos != null) { zos.close(); zos = null }
}
