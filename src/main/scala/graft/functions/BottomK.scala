package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Mutable buffer: a bounded ordered set of the k smallest DISTINCT longs. */
final class BottomKBuffer(val set: java.util.TreeSet[java.lang.Long])

/** Hash-aggregable bounded bottom-k DISTINCT long values per group — the
  * KMV-sketch builder ([[graft.operators.Profile.kmvSketch]]).
  *
  * Why not `distinct()` + [[TopNRows]]: a KMV sketch needs the k smallest
  * distinct HASH values, and a global `distinct()` first exchanges every
  * distinct key in the data — the full-universe shuffle the sketch exists
  * to avoid. A plain value heap can't substitute either (duplicates of one
  * small hash would evict genuine members). This aggregate dedups INSIDE
  * the bounded buffer: a TreeSet of ≤ k longs per group, planned as
  * ObjectHashAggregate with map-side combine, so each input partition
  * reduces to ≤ k values before the shuffle and the exchange carries at
  * most k·partitions longs per group no matter the corpus size.
  *
  * Output: ascending array of the ≤ k smallest distinct inputs. NULLs are
  * skipped. Deterministic: a pure function of the input VALUE SET under
  * any partitioning — which is what lets a DuckDB oracle recompute the
  * sketch bit-for-bit (`SELECT DISTINCT h ORDER BY h LIMIT k`).
  */
case class BottomKDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKBuffer] {

  require(k > 0, "bottom_k_distinct: k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bottom_k_distinct"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects a bigint column, got ${other.sql}")
    }

  override def createAggregationBuffer(): BottomKBuffer =
    new BottomKBuffer(new java.util.TreeSet[java.lang.Long]())

  private def offer(buf: BottomKBuffer, v: Long): Unit = {
    val s = buf.set
    if (s.size < k) { s.add(v); () }
    else if (v < s.last()) {
      // TreeSet.add dedups: only shrink-by-one when v actually entered
      if (s.add(v)) { s.remove(s.last()); () }
    }
  }

  override def update(buf: BottomKBuffer, input: InternalRow): BottomKBuffer = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BottomKBuffer, other: BottomKBuffer): BottomKBuffer = {
    val it = other.set.iterator()
    while (it.hasNext) offer(buf, it.next())
    buf
  }

  override def eval(buf: BottomKBuffer): Any = {
    val out = new Array[Any](buf.set.size)
    val it = buf.set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: BottomKBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.set.size * 8)
    val it = buf.set.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BottomKBuffer = {
    val buf = createAggregationBuffer()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) buf.set.add(bb.getLong())
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKDistinct =
    copy(child = newChildren.head)
}

object BottomK {
  def distinct(c: Column, k: Int): Column =
    ColumnBridge.column(BottomKDistinct(ColumnBridge.expression(c), k)
      .toAggregateExpression())
}
