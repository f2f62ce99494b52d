package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mutable Misra–Gries buffer: at most `k` counters. */
final class MgBuffer(val counts: scala.collection.mutable.HashMap[UTF8String, Long])

/** MISRA–GRIES heavy hitters: the bounded-memory frequent-items summary
  * for the regime where even the per-(group, item) count table is too big
  * to aggregate — `k` counters per group, ever, no matter how many
  * distinct items stream past. The classic guarantees (Misra & Gries
  * 1982; merge bounds per Agarwal et al., "Mergeable Summaries", PODS'12):
  *
  *  - every item with true frequency > n/(k+1) IS in the summary
  *    (no false negatives among the truly heavy);
  *  - each reported count UNDERESTIMATES the true count by at most
  *    n/(k+1) (n = items seen by the group).
  *
  * When a group's distinct-item count never exceeds `k` the summary is
  * simply its exact count map — exact, merge-order-independent, and
  * oracle-checkable (the battery row runs in this regime; the
  * approximate regime is property-tested). In the approximate regime the
  * surviving set can depend on partitioning within the guarantee bounds
  * — callers treat the summary as a candidate set, as with every sketch.
  *
  * Why not [[TopNRows]] over exact counts: that needs the full
  * (group, item) aggregate FIRST — fine when the item universe is
  * Zipf-bounded (tokens), fatal when it is not (URLs, user ids, raw
  * n-grams at crawl scale). This aggregate IS the first pass: map-side
  * partial combine with O(k) state, mergeable buffers, one shuffle of
  * k·partitions counters max.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"
  private val entryType = new StructType()
    .add("item", StringType).add("count_lb", LongType)
  override def dataType: DataType = ArrayType(entryType, containsNull = false)

  @transient private lazy val serProj =
    UnsafeProjection.create(Array[DataType](ArrayType(entryType, containsNull = false)))

  override def createAggregationBuffer(): MgBuffer =
    new MgBuffer(new scala.collection.mutable.HashMap[UTF8String, Long])

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String]
      buf.counts.get(key) match {
        case Some(c) => buf.counts.update(key, c + 1)
        case None =>
          if (buf.counts.size < k) buf.counts.update(key.copy(), 1L)
          else {
            // the MG tick: decrement every counter, drop zeros — one
            // unmatched arrival "cancels" one occurrence of each tracked
            // item, which is where the n/(k+1) bound comes from
            val dead = scala.collection.mutable.ArrayBuffer[UTF8String]()
            buf.counts.keysIterator.foreach { kk =>
              val nc = buf.counts(kk) - 1
              if (nc == 0) dead += kk else buf.counts.update(kk, nc)
            }
            dead.foreach(buf.counts.remove)
          }
      }
    }
    buf
  }

  override def merge(buf: MgBuffer, other: MgBuffer): MgBuffer = {
    other.counts.foreach { case (kk, v) =>
      buf.counts.update(kk, buf.counts.getOrElse(kk, 0L) + v)
    }
    if (buf.counts.size > k) {
      // mergeable-summaries reduction: subtract the (k+1)-th largest
      // count from everyone, drop the non-positive — same bound algebra
      // as the streaming tick
      val sortedCounts = buf.counts.values.toArray.sorted(Ordering[Long].reverse)
      val cut = sortedCounts(k)
      val dead = scala.collection.mutable.ArrayBuffer[UTF8String]()
      buf.counts.keysIterator.foreach { kk =>
        val nc = buf.counts(kk) - cut
        if (nc <= 0) dead += kk else buf.counts.update(kk, nc)
      }
      dead.foreach(buf.counts.remove)
    }
    buf
  }

  override def eval(buf: MgBuffer): Any = {
    // deterministic presentation: count desc, then item asc
    val sorted = buf.counts.toArray.sortBy { case (kk, c) => (-c, kk) }
    new GenericArrayData(sorted.map { case (kk, c) =>
      val r = new GenericInternalRow(2)
      r.update(0, kk); r.update(1, c); r: Any
    })
  }

  override def serialize(buf: MgBuffer): Array[Byte] = {
    val entries = buf.counts.toArray.map { case (kk, c) =>
      val r = new GenericInternalRow(2)
      r.update(0, kk); r.update(1, c); r: Any
    }
    val holder = new GenericInternalRow(1)
    holder.update(0, new GenericArrayData(entries))
    serProj.apply(holder).getBytes
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val buf = createAggregationBuffer()
    val r = new UnsafeRow(1)
    r.pointTo(bytes, bytes.length)
    val arr = r.getArray(0)
    var i = 0
    while (i < arr.numElements()) {
      val e = arr.getStruct(i, 2)
      buf.counts.update(e.getUTF8String(0).copy(), e.getLong(1))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs(0))
}

object HeavyHitters {
  /** `misra_gries(item, k)` as an aggregate Column: array of
    * (item, count_lb) structs, count desc then item asc.
    */
  def sketch(item: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(item), k).toAggregateExpression())
}
