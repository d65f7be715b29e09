package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** K-minimum-values distinct-count sketch as a native Catalyst AGGREGATE
  * (`TypedImperativeAggregate` — the engine-extension class for custom
  * aggregation state; the scalar expressions in this package cannot hold
  * per-group state). Collects the k smallest DISTINCT values of a long
  * hash column per group; the classic KMV estimator
  * `(k-1) * domain / kth_min` then reads off the result — and because
  * the sketch is hash-ordered with NO randomness, the whole thing is
  * deterministic and cell-exact in any engine: an oracle can recompute
  * the identical k minima with `list_sort(list_distinct(...))[1:k]`.
  * That is the difference from `approx_count_distinct` (HLL±RNG,
  * rows-only checkable) — KMV trades a slightly worse constant for
  * engine-portable exactness of the SKETCH itself.
  *
  * Scale: the partial-aggregate state is <= k longs (serialize = one
  * ByteBuffer), merges are k-way bounded unions — map-side combine
  * friendly, shuffle bytes O(k) per group regardless of corpus size.
  */
case class KmvSketch(child: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 1, s"graft_kmv needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_kmv requires a bigint hash column, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(b: java.util.TreeSet[java.lang.Long], l: Long): Unit =
    KmvSketch.insert(b, l, k)

  override def update(b: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(b, v.asInstanceOf[Long])
    b
  }

  override def merge(b: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(b, it.next())
    b
  }

  override def eval(b: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Any](b.size)
    val it = b.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out) // TreeSet iterates ascending: sorted minima
  }

  override def serialize(b: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * b.size)
    val it = b.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val b = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) b.add(bb.getLong())
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren.head)
}

object KmvSketch {
  /** Sorted k smallest distinct values of a LONG column, per group. */
  def kmv(c: Column, k: Int): Column =
    GraftShims.column(KmvSketch(GraftShims.expression(c), k)
      .toAggregateExpression())

  /** Bounded distinct-minima insert — the ONE sketch mutation, shared by
    * the aggregate and the streaming twin so batch and stream cannot
    * drift: keep l iff unseen and (capacity left or below the current
    * kth minimum). */
  def insert(b: java.util.TreeSet[java.lang.Long], l: Long, k: Int): Unit =
    if (!b.contains(l)) {
      if (b.size < k) { b.add(l); () }
      else if (l < b.last) { b.add(l); b.pollLast(); () }
    }
}
