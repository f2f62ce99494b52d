package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Mutable buffer: a bounded worst-at-head heap of (ordering key, payload). */
final class TopNBuffer(val heap: scala.collection.mutable.PriorityQueue[(InternalRow, InternalRow)])

/** Hash-aggregable bounded TOP-N rows per group: the `n` `rowExpr` structs
  * with the smallest (`isMax=false`) or largest `ordExpr` structs, returned
  * as an array in rank order (best first).
  *
  * Why not `row_number() OVER (PARTITION BY k ORDER BY ord) <= n`: a window
  * function SORTS every partition group in full — O(|group| log |group|) per
  * group and no partial aggregation, so one hot group becomes one hot task.
  * This aggregate keeps an O(n) heap per group, planned as
  * ObjectHashAggregate with map-side combine: each input partition reduces
  * its share of a group to ≤ n rows BEFORE the shuffle, so the exchange
  * carries at most n·partitions rows per group no matter how skewed the
  * input — the difference between a per-stratum sample working and a hot
  * stratum OOMing a task at 100 TB.
  */
case class TopNRows(
    rowExpr: Expression,
    ordExpr: Expression,
    n: Int,
    isMax: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopNBuffer] {

  require(n > 0, "n must be positive")

  override def children: Seq[Expression] = Seq(rowExpr, ordExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(rowExpr.dataType, containsNull = false)
  override def prettyName: String = if (isMax) "top_n_rows" else "bottom_n_rows"

  private lazy val ordType = ordExpr.dataType.asInstanceOf[StructType]
  private lazy val rowType = rowExpr.dataType.asInstanceOf[StructType]
  @transient private lazy val ordering: Ordering[InternalRow] =
    TypeUtils.getInterpretedOrdering(ordType).asInstanceOf[Ordering[InternalRow]]
  // heap head = the WORST kept element (largest when keeping smallest and
  // vice versa), so a full heap replaces its head iff the candidate beats it
  @transient private lazy val heapOrdering: Ordering[(InternalRow, InternalRow)] = {
    val base = Ordering.by[(InternalRow, InternalRow), InternalRow](_._1)(ordering)
    if (isMax) base.reverse else base
  }
  private lazy val pairType = new StructType().add("o", ordType).add("r", rowType)
  @transient private lazy val serProj =
    UnsafeProjection.create(Array[DataType](ArrayType(pairType, containsNull = false)))

  override def createAggregationBuffer(): TopNBuffer =
    new TopNBuffer(new scala.collection.mutable.PriorityQueue()(heapOrdering))

  private def offer(buf: TopNBuffer, ord: InternalRow, row: InternalRow): Unit = {
    if (buf.heap.size < n) buf.heap.enqueue((ord, row))
    else {
      val worst = buf.heap.head._1
      val c = ordering.compare(ord, worst)
      if (if (isMax) c > 0 else c < 0) {
        buf.heap.dequeue()
        buf.heap.enqueue((ord, row))
      }
    }
  }

  override def update(buf: TopNBuffer, input: InternalRow): TopNBuffer = {
    val ord = ordExpr.eval(input).asInstanceOf[InternalRow]
    if (ord != null) {
      // copy lazily: only rows that enter the heap are retained
      if (buf.heap.size < n || {
        val c = ordering.compare(ord, buf.heap.head._1)
        if (isMax) c > 0 else c < 0
      }) {
        offer(buf, ord.copy(), rowExpr.eval(input).asInstanceOf[InternalRow].copy())
      }
    }
    buf
  }

  override def merge(buf: TopNBuffer, other: TopNBuffer): TopNBuffer = {
    other.heap.foreach { case (o, r) => offer(buf, o, r) }
    buf
  }

  override def eval(buf: TopNBuffer): Any = {
    val sorted = buf.heap.toArray.sortBy(_._1)(if (isMax) ordering.reverse else ordering)
    new GenericArrayData(sorted.map(_._2.asInstanceOf[Any]))
  }

  override def serialize(buf: TopNBuffer): Array[Byte] = {
    val pairs = buf.heap.toArray.map { case (o, r) =>
      val p = new GenericInternalRow(2); p.update(0, o); p.update(1, r); p: Any
    }
    val holder = new GenericInternalRow(1)
    holder.update(0, new GenericArrayData(pairs))
    serProj.apply(holder).getBytes
  }

  override def deserialize(bytes: Array[Byte]): TopNBuffer = {
    val buf = createAggregationBuffer()
    val r = new UnsafeRow(1)
    r.pointTo(bytes, bytes.length)
    val arr = r.getArray(0)
    var i = 0
    while (i < arr.numElements()) {
      val p = arr.getStruct(i, 2)
      buf.heap.enqueue((p.getStruct(0, ordType.length).copy(),
        p.getStruct(1, rowType.length).copy()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopNRows =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopNRows =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(rowExpr = cs(0), ordExpr = cs(1))
}

object TopN {
  /** `bottom_n_rows(row, ord, n)` / `top_n_rows(row, ord, n)` as aggregate
    * Columns: the n payload structs with the smallest / largest ordering
    * structs, in rank order.
    */
  def rows(row: Column, ord: Column, n: Int, isMax: Boolean): Column =
    ColumnBridge.column(
      TopNRows(ColumnBridge.expression(row), ColumnBridge.expression(ord), n, isMax)
        .toAggregateExpression())
}
