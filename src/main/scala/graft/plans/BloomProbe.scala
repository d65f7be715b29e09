package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd probe of a broadcast [[BloomFilter]] against a string column
  * — the `might_contain` pattern Spark keeps internal to its runtime
  * row-group filtering, exposed for the streaming near-dup gate
  * ([[graft.streaming.EventStream.NearDupFilter]]). Replaces the one UDF
  * the codebase carried: a UDF breaks whole-stage codegen for its whole
  * stage; this stays inside the span (spec-pinned).
  *
  * Semantics match `BloomFilter.mightContainString`: the probe hashes the
  * UTF-8 bytes (`mightContainBinary(utf8.getBytes)` — the exact
  * equivalence `mightContainString` itself is defined by). The broadcast
  * handle rides the expression; executors fetch blocks once per task set,
  * not per row. */
case class BloomProbe(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_probe requires string, got ${t.catalogString}")
  }

  override def dataType: DataType = BooleanType

  override def nullSafeEval(input: Any): Any =
    bloom.value.mightContainBinary(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bloom,
      classOf[Broadcast[BloomFilter]].getName)
    nullSafeCodeGen(ctx, ev, in =>
      s"""
         |${ev.value} = ((org.apache.spark.util.sketch.BloomFilter)
         |  $bcRef.value()).mightContainBinary($in.getBytes());
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbe =
    copy(child = newChild)
}

object BloomProbe {
  def mightContain(c: Column, bloom: Broadcast[BloomFilter]): Column =
    GraftShims.column(BloomProbe(GraftShims.expression(c), bloom))
}
