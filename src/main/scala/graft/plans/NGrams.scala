package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.sql.GraftShims
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd word n-grams over a token array: element i of the
  * output is `tokens[i] + " " + ... + tokens[i+n-1]` — the shingle
  * primitive of the dedup family (Dedup.shinglesOf).
  *
  * Exists for the same reason as [[DotProduct]]: the equivalent
  * higher-order-function formulation (`transform(sequence(1, cnt),
  * i -> concat_ws(" ", element_at(toks, i), ...))`) runs INTERPRETED, and
  * each of its n `element_at` calls re-walks the lambda machinery per
  * shingle. This is a single tight loop over the backing array.
  *
  * Semantics (matching Dedup's HOF version + the DuckDB oracle): fewer
  * than n tokens -> empty array; null elements are SKIPPED along with
  * their separators, exactly like `concat_ws` ('a', null, 'c' -> "a c") —
  * so the native and HOF formulations agree on any input, not just the
  * null-free tokenizer output. Output is NOT deduplicated — compose with
  * `array_distinct` as the caller requires.
  */
case class NGrams(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
      s"graft_ngrams needs n >= 1, got $n")
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_ngrams requires array<string>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val total = arr.numElements()
    val cnt = total - (n - 1)
    if (cnt <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](cnt)
    val space = UTF8String.fromString(" ")
    var i = 0
    while (i < cnt) {
      // UTF8String.concatWs skips null inputs AND their separators —
      // the exact concat_ws contract the HOF baseline relies on
      val parts = new Array[UTF8String](n)
      var k = 0
      while (k < n) {
        parts(k) = if (arr.isNullAt(i + k)) null else arr.getUTF8String(i + k)
        k += 1
      }
      out(i) = UTF8String.concatWs(space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cnt = ctx.freshName("cnt")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val parts = ctx.freshName("parts")
      val u8 = "org.apache.spark.unsafe.types.UTF8String"
      // the separator is a constant: one shared instance per plan, not a
      // fresh 1-byte UTF8String allocated on every row of the map stage
      val sep = ctx.addReferenceObj("ngramSep", UTF8String.fromString(" "),
        "org.apache.spark.unsafe.types.UTF8String")
      s"""
         |int $cnt = $a.numElements() - ${n - 1};
         |if ($cnt < 0) $cnt = 0;
         |Object[] $out = new Object[$cnt];
         |for (int $i = 0; $i < $cnt; $i++) {
         |  $u8[] $parts = new $u8[$n];
         |  for (int $k = 0; $k < $n; $k++) {
         |    $parts[$k] = $a.isNullAt($i + $k) ? null : $a.getUTF8String($i + $k);
         |  }
         |  $out[$i] = $u8.concatWs($sep, $parts);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NGrams =
    copy(child = newChild)
}

object NGrams {
  /** Column-API entry point. */
  def ngrams(tokens: Column, n: Int): Column =
    GraftShims.column(NGrams(GraftShims.expression(tokens), n))
}
