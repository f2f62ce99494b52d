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

/** Mutable buffer: the k smallest distinct hashes, each carrying a weight
  * (max per hash — see [[BottomKDistinctWeighted]]).
  */
final class BottomKWBuffer(val map: java.util.TreeMap[java.lang.Long, java.lang.Long])

/** WEIGHTED bottom-k: the k smallest distinct long hashes per group, each
  * paired with a weight — the builder behind
  * [[graft.operators.Profile.kmvSketchWeighted]] (estimate the total
  * WEIGHT over the distinct-key universe — bytes per URL, tokens per doc —
  * from a bounded sample, one scan).
  *
  * Membership (which hashes survive) is decided by the hash alone, exactly
  * like [[BottomKDistinct]] — so the weighted sketch's hash set equals the
  * unweighted sketch's, and the two compose (a weighted sketch IS a KMV
  * sketch). When the same hash arrives with different weights (a key whose
  * weight varies across rows), the MAX weight is kept: max is the only
  * associative, commutative, duplicate-tolerant choice that is also a pure
  * function of the input set — first-seen would depend on partitioning.
  * NULL weights count as absent (a hash seen only with NULL weight carries
  * weight 0 — the sum below must never be NULL-poisoned).
  *
  * Output: array of `struct<h: bigint, w: bigint>` ascending by h.
  * Bounded buffer (TreeMap of ≤ k entries), ObjectHashAggregate with
  * map-side combine: the exchange carries ≤ k·partitions pairs per group.
  */
case class BottomKDistinctWeighted(
    hash: Expression,
    weight: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKWBuffer] {

  require(k > 0, "bottom_k_weighted: k must be positive")

  override def children: Seq[Expression] = Seq(hash, weight)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("h", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("w", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "bottom_k_weighted"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (hash.dataType, weight.dataType) match {
      case (LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (h, w) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (bigint, bigint), got (${h.sql}, ${w.sql})")
    }

  override def createAggregationBuffer(): BottomKWBuffer =
    new BottomKWBuffer(new java.util.TreeMap[java.lang.Long, java.lang.Long]())

  private def offer(buf: BottomKWBuffer, h: Long, w: Long): Unit = {
    val m = buf.map
    val existing = m.get(h)
    if (existing != null) {
      if (w > existing) { m.put(h, w); () }
    } else if (m.size < k) { m.put(h, w); () }
    else if (h < m.lastKey()) { m.put(h, w); m.remove(m.lastKey()); () }
  }

  override def update(buf: BottomKWBuffer, input: InternalRow): BottomKWBuffer = {
    val h = hash.eval(input)
    if (h != null) {
      val w = weight.eval(input)
      offer(buf, h.asInstanceOf[Long],
        if (w == null) 0L else w.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: BottomKWBuffer, other: BottomKWBuffer): BottomKWBuffer = {
    val it = other.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      offer(buf, e.getKey.longValue(), e.getValue.longValue())
    }
    buf
  }

  override def eval(buf: BottomKWBuffer): Any = {
    val out = new Array[Any](buf.map.size)
    val it = buf.map.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = InternalRow(e.getKey.longValue(), e.getValue.longValue())
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: BottomKWBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.map.size * 16)
    val it = buf.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey.longValue()); bb.putLong(e.getValue.longValue())
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BottomKWBuffer = {
    val buf = createAggregationBuffer()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 16) buf.map.put(bb.getLong(), bb.getLong())
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKDistinctWeighted =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKDistinctWeighted =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKDistinctWeighted =
    copy(hash = newChildren.head, weight = newChildren(1))
}

object BottomK {
  def distinct(c: Column, k: Int): Column =
    ColumnBridge.column(BottomKDistinct(ColumnBridge.expression(c), k)
      .toAggregateExpression())

  def weighted(h: Column, w: Column, k: Int): Column =
    ColumnBridge.column(BottomKDistinctWeighted(
      ColumnBridge.expression(h), ColumnBridge.expression(w), k)
      .toAggregateExpression())
}
