package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.{GraftShims, SparkSessionExtensions}

/** Native codegen'd dot product over two `array<float>`/`array<double>`
  * columns: `acc += a[i] * b[i]` left-to-right (bit-identical to the
  * `aggregate(zip_with(...))` fold and to a sequential C loop, so oracle
  * results are unchanged — only ~10x faster than interpreted
  * higher-order-function eval in the vector hot paths).
  *
  * Null semantics match the HOF formulation exactly: mismatched lengths or
  * a null element yield NULL (zip_with pads the shorter side with nulls,
  * which poison the fold) — not a silently truncated partial sum.
  *
  * Preference order per the Spark-first design: compose built-ins where
  * they codegen; drop to a custom Expression (this) where the built-in
  * path (HOF lambdas) can't; never a Scala UDF.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires array<float|double> inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  private def elemGetter(e: Expression): String =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => "getFloat"
      case DoubleType => "getDouble"
      case t => throw new IllegalArgumentException(
        s"graft_dot requires float/double array elements, got $t")
    }

  private def mayHaveNullElems: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = aa.numElements()
    if (n != bb.numElements()) return null
    val aFloat = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val bFloat = right.dataType.asInstanceOf[ArrayType].elementType == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (aa.isNullAt(i) || bb.isNullAt(i)) return null
      val x = if (aFloat) aa.getFloat(i).toDouble else aa.getDouble(i)
      val y = if (bFloat) bb.getFloat(i).toDouble else bb.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      // element null checks only when the array types can hold nulls —
      // keeps the tight-loop branch out of the common non-null case
      val nullCheck =
        if (mayHaveNullElems)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $acc += (double)$a.${elemGetter(left)}($i) * (double)$b.${elemGetter(right)}($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-API entry point (no session extension needed). */
  def dot(a: Column, b: Column): Column =
    GraftShims.column(DotProduct(
      GraftShims.expression(a), GraftShims.expression(b)))
}

/** Session extension: `SELECT graft_dot(a, b)` from SQL.
  * Activate with spark.sql.extensions=graft.plans.GraftExtensions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Wrap a builder with an arity check: a wrong argument count gets a
    * message naming the function and its signature, not a bare
    * IndexOutOfBoundsException from `children(1)`. */
  private def sig(signature: String, n: Int)(
      f: Seq[Expression] => Expression): Seq[Expression] => Expression =
    children => {
      if (children.length != n) throw new IllegalArgumentException(
        s"$signature expects $n argument(s), got ${children.length}")
      f(children)
    }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      sig("graft_dot(a, b)", 2)(c => DotProduct(c(0), c(1)))))
    ext.injectFunction((
      new FunctionIdentifier("graft_md5long"),
      new ExpressionInfo(classOf[Md5Long].getName, "graft_md5long"),
      sig("graft_md5long(s)", 1)(c => Md5Long(c(0)))))
    ext.injectFunction((
      new FunctionIdentifier("graft_deflate_len"),
      new ExpressionInfo(classOf[DeflateLen].getName, "graft_deflate_len"),
      sig("graft_deflate_len(payload)", 1)(c => DeflateLen(c(0)))))
    ext.injectFunction((
      new FunctionIdentifier("graft_audio_meta"),
      new ExpressionInfo(classOf[graft.multimodal.AudioMeta].getName,
        "graft_audio_meta"),
      sig("graft_audio_meta(payload)", 1)(c => graft.multimodal.AudioMeta(c(0)))))
    ext.injectFunction((
      new FunctionIdentifier("graft_image_meta"),
      new ExpressionInfo(classOf[graft.multimodal.ImageMeta].getName,
        "graft_image_meta"),
      sig("graft_image_meta(payload)", 1)(c => graft.multimodal.ImageMeta(c(0)))))
    ext.injectFunction((
      new FunctionIdentifier("graft_kmv"),
      new ExpressionInfo(classOf[KmvSketch].getName, "graft_kmv"),
      sig("graft_kmv(hash, k)", 2)(c => c(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(kk: Int, _) =>
          KmvSketch(c(0), kk)
        case other => throw new IllegalArgumentException(
          s"graft_kmv(hash, k): k must be an integer literal, got $other")
      })))
    ext.injectFunction((
      new FunctionIdentifier("graft_cms"),
      new ExpressionInfo(classOf[CmsSketch].getName, "graft_cms"),
      sig("graft_cms(key, d, w)", 3)(c => c match {
        case Seq(key,
            org.apache.spark.sql.catalyst.expressions.Literal(d: Int, _),
            org.apache.spark.sql.catalyst.expressions.Literal(w: Int, _)) =>
          CmsSketch(key, d, w)
        case other => throw new IllegalArgumentException(
          s"graft_cms(key, d, w): d and w must be integer literals, got $other")
      })))
    ext.injectFunction((
      new FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      sig("graft_nfc(s)", 1)(c => NfcNormalize(c(0)))))
    ext.injectFunction((
      new FunctionIdentifier("graft_ngrams"),
      new ExpressionInfo(classOf[NGrams].getName, "graft_ngrams"),
      sig("graft_ngrams(tokens, n)", 2)(c => c(1) match {
        // n must be a literal: the shingle width shapes the expression
        case org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _) =>
          NGrams(c(0), n)
        case other => throw new IllegalArgumentException(
          s"graft_ngrams(tokens, n): n must be an integer literal, got $other")
      })))
    // the WKB codec pair, SQL-visible like every sibling expression
    ext.injectFunction((
      new FunctionIdentifier("graft_wkb_geom"),
      new ExpressionInfo(classOf[WkbGeom].getName, "graft_wkb_geom"),
      sig("graft_wkb_geom(wkb)", 1)(c => WkbGeom(c(0)))))
    ext.injectFunction((
      new FunctionIdentifier("graft_wkb_write"),
      new ExpressionInfo(classOf[WkbWrite].getName, "graft_wkb_write"),
      sig("graft_wkb_write(geom, geomType)", 2)(c => c(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(t: Int, _) =>
          WkbWrite(c(0), t)
        case other => throw new IllegalArgumentException(
          s"graft_wkb_write(geom, geomType): geomType must be an integer " +
            s"literal, got $other")
      })))
    ext.injectOptimizerRule(_ => GridRangeJoinRule)
  }
}
