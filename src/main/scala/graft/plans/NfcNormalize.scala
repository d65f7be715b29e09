package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.GraftShims
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression — the first
  * step of corpus text canonicalization (composed vs decomposed accents
  * must hash identically before any dedup signature is computed; CCNet /
  * OSCAR normalize before minhashing for exactly this reason).
  *
  * Spark has no normalization builtin, and a Scala UDF here would break
  * whole-stage codegen on the hottest map stage of the pipeline. ASCII
  * fast path: 7-bit input IS its own NFC form, so the dominant case
  * (English web text) returns the original UTF8String without even a
  * String materialization. Mirrors DuckDB `nfc_normalize` (both sides
  * implement the public Unicode UAX #15 algorithm).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires string, got ${t.catalogString}")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.plans.NfcNormalize.nfc($in);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def nfc(s: UTF8String): UTF8String = {
    if (isAscii(s)) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  private def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }

  def nfcNormalize(c: Column): Column =
    GraftShims.column(NfcNormalize(GraftShims.expression(c)))
}
