package graft.plans

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Count-Min-Sketch frequency aggregate as a native Catalyst
  * `TypedImperativeAggregate` — the sketch path for heavy-hitter counting
  * next to the exact `q_top_tokens` groupBy: when the key domain is too
  * large to aggregate exactly (per-URL / per-ngram counts at 100 TB), a
  * `d x w` counter grid answers `count(key)` within `eps * N`
  * overestimate, with O(d*w) state per group regardless of key
  * cardinality.
  *
  * Like [[KmvSketch]], the sketch carries NO randomness: row `i` hashes
  * with the 60-bit md5 of `"i:key"` ([[Md5Long.top60]], the repo's
  * standard token hash) mod `w`, so sketch AND estimates are
  * deterministic, order-independent (merges are elementwise adds), and
  * cell-exact in any engine — an oracle recomputes the same grid with
  * `('0x' || substr(md5(i || ':' || key), 1, 15))::BIGINT % w`. That is
  * the difference from Spark's built-in CountMinSketchAgg, whose seeded
  * hash family is opaque to cross-engine checks.
  *
  * Scale: the partial-aggregate state is d*w longs (default 4x256 = 8 KB)
  * however many rows flow in — map-side combine friendly; the estimate
  * side is a broadcast of that one row joined to whatever keys need
  * answering ([[CmsSketch.estimate]]).
  */
case class CmsSketch(child: Expression, d: Int, w: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(d >= 1 && w >= 2, s"graft_cms needs d >= 1, w >= 2, got d=$d w=$w")
  // bound the grid so d*w can neither overflow Int nor demand a
  // multi-GB buffer per group: fail at plan time with a clear message,
  // not mid-job with a wrapped allocation size
  require(d.toLong * w <= (1L << 24),
    s"graft_cms grid d*w = ${d.toLong * w} exceeds 2^24 cells")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_cms requires a string key column, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
      var i = 0
      while (i < d) {
        b(i * w + CmsSketch.bucket(i, key, w)) += 1L
        i += 1
      }
    }
    b
  }

  override def merge(b: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b.length) { b(i) += other(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any =
    new GenericArrayData(b.map(v => v: Any))

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * b.length)
    b.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CmsSketch =
    copy(child = newChildren.head)
}

object CmsSketch {

  /** Row `i`'s bucket for `key`: md5-top60 of "i:key" mod w — positive, so
    * `%` and `pmod` agree across engines. */
  def bucket(i: Int, key: String, w: Int): Int = {
    val digest = org.apache.commons.codec.digest.DigestUtils.md5(
      (i.toString + ":" + key).getBytes(StandardCharsets.UTF_8))
    (Md5Long.top60(digest) % w).toInt
  }

  /** The d*w counter grid (row-major array<bigint>) over a string key. */
  def cms(key: Column, d: Int = 4, w: Int = 256): Column =
    GraftShims.column(CmsSketch(GraftShims.expression(key), d, w)
      .toAggregateExpression())

  /** Point estimate from a sketch column: min over rows of the key's
    * bucket counter — pure expressions, so a broadcast sketch answers any
    * number of keys inside whole-stage codegen. */
  def estimate(sketch: Column, key: Column, d: Int = 4, w: Int = 256): Column =
    least((0 until d).map { i =>
      element_at(sketch,
        (lit(i * w) + pmod(Md5Long.md5Long(concat(lit(s"$i:"), key.cast("string"))),
          lit(w.toLong)).cast("int") + lit(1)).cast("int"))
    }: _*)
}
