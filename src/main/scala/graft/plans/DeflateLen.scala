package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType}
import org.apache.spark.sql.GraftShims

/** DEFLATE-compressed byte length of a string/binary column — the
  * compression-ratio quality signal (Gopher/RefinedWeb drop documents
  * whose text compresses too well: boilerplate and repetition compress,
  * natural prose doesn't). A native codegen expression: one Deflater pass
  * per row inside whole-stage codegen, no UDF, no materialized
  * compressed payload — only its length.
  *
  * Deterministic for a fixed input and zlib level (level 6, raw deflate)
  * on the JVM, which is all the quality RATIO needs; there is no DuckDB
  * deflate, so operators built on this are spec-verified, not oracled.
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_deflate_len requires string/binary, got ${t.catalogString}")
  }

  override def dataType: DataType = IntegerType

  private def bytesOf(input: Any): Array[Byte] = child.dataType match {
    case StringType => input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    case _ => input.asInstanceOf[Array[Byte]]
  }

  override def nullSafeEval(input: Any): Any =
    DeflateLen.deflatedLength(bytesOf(input))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val bytes = child.dataType match {
        case StringType => s"$in.getBytes()"
        case _ => in
      }
      s"${ev.value} = graft.plans.DeflateLen.deflatedLength($bytes);"
    })

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object DeflateLen {
  // one Deflater + scratch buffer per executor thread, reset() per row:
  // constructing (and end()-ing) a native zlib context per row would
  // dominate the per-row cost this expression exists to minimize
  private val local = new ThreadLocal[(java.util.zip.Deflater, Array[Byte])] {
    override def initialValue() =
      (new java.util.zip.Deflater(6, true), new Array[Byte](8192))
  }

  /** Raw-deflate (no zlib header) length at level 6. Fixed level, not
    * DEFAULT_COMPRESSION, so the value survives JDK default changes. */
  def deflatedLength(bytes: Array[Byte]): Int = {
    val (d, buf) = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    var n = 0
    while (!d.finished()) n += d.deflate(buf)
    n
  }

  def deflateLen(c: Column): Column =
    GraftShims.column(DeflateLen(GraftShims.expression(c)))
}
