package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.sql.GraftShims

/** Top 60 bits of md5 as a non-negative long — the token-hash primitive of
  * the minhash/simhash family (Text.md5Long).
  *
  * Value-identical to `conv(substring(md5(x), 1, 15), 16, 10)` — the first
  * 15 hex chars are the first 60 bits, i.e. big-endian(first 8 digest
  * bytes) >>> 4 — but computed straight from the digest bytes: the
  * built-in chain materializes a 32-char hex string, substrings it, and
  * re-parses it per token, which is most of the hashing cost at
  * millions-of-tokens scale.
  */
case class Md5Long(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_md5long requires string/binary, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType

  private def bytesOf(input: Any): Array[Byte] = child.dataType match {
    case StringType => input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    case _ => input.asInstanceOf[Array[Byte]]
  }

  override def nullSafeEval(input: Any): Any = {
    val d = org.apache.commons.codec.digest.DigestUtils.md5(bytesOf(input))
    Md5Long.top60(d)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val d = ctx.freshName("digest")
      val bytes = child.dataType match {
        case StringType => s"$in.getBytes()"
        case _ => in
      }
      s"""
         |byte[] $d = org.apache.commons.codec.digest.DigestUtils.md5($bytes);
         |${ev.value} = graft.plans.Md5Long.top60($d);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Md5Long =
    copy(child = newChild)
}

object Md5Long {
  /** Big-endian long of the first 8 digest bytes, >>> 4 == first 15 hex
    * nibbles as an unsigned 60-bit value. */
  def top60(d: Array[Byte]): Long = {
    var l = 0L
    var i = 0
    while (i < 8) { l = (l << 8) | (d(i) & 0xffL); i += 1 }
    l >>> 4
  }

  def md5Long(c: Column): Column =
    GraftShims.column(Md5Long(GraftShims.expression(c)))
}
