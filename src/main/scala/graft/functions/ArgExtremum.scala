package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
import org.apache.spark.sql.catalyst.expressions.UnsafeRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StructType}

/** Mutable buffer: the best (ordering key, payload row) seen so far. */
final class ArgExtremumBuffer(var ord: InternalRow, var row: InternalRow)

/** Hash-aggregable ARGMIN/ARGMAX-row: returns the `rowExpr` struct of the row
  * whose `ordExpr` struct is smallest (`isMax=false`) or largest per group.
  *
  * Why not `min_by`/`max_by`: with a STRUCT ordering key (needed for the
  * deterministic full-row tie-break) those are DeclarativeAggregates with
  * non-primitive buffers, which Spark can only plan as SortAggregate — a full
  * sort of every input partition. This TypedImperativeAggregate plans as
  * ObjectHashAggregate: map-side partial aggregation with O(groups) hash
  * state, no sort, graceful sort-based fallback under memory pressure —
  * measured ~6× faster at 600k rows and the difference only grows with scale.
  */
case class ArgExtremumRow(
    rowExpr: Expression,
    ordExpr: Expression,
    isMax: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArgExtremumBuffer] {

  override def children: Seq[Expression] = Seq(rowExpr, ordExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = rowExpr.dataType
  override def prettyName: String = if (isMax) "argmax_row" else "argmin_row"

  private lazy val ordType = ordExpr.dataType.asInstanceOf[StructType]
  private lazy val rowType = rowExpr.dataType.asInstanceOf[StructType]
  @transient private lazy val ordering: Ordering[InternalRow] =
    TypeUtils.getInterpretedOrdering(ordType).asInstanceOf[Ordering[InternalRow]]
  @transient private lazy val serProj =
    UnsafeProjection.create(Array[DataType](ordType, rowType))
  @transient private lazy val pairRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)

  override def createAggregationBuffer(): ArgExtremumBuffer =
    new ArgExtremumBuffer(null, null)

  private def better(candidate: InternalRow, incumbent: InternalRow): Boolean = {
    if (incumbent == null) true
    else {
      val c = ordering.compare(candidate, incumbent)
      if (isMax) c > 0 else c < 0
    }
  }

  override def update(buf: ArgExtremumBuffer, input: InternalRow): ArgExtremumBuffer = {
    val ord = ordExpr.eval(input).asInstanceOf[InternalRow]
    if (ord != null && better(ord, buf.ord)) {
      buf.ord = ord.copy()
      buf.row = rowExpr.eval(input).asInstanceOf[InternalRow].copy()
    }
    buf
  }

  override def merge(buf: ArgExtremumBuffer, other: ArgExtremumBuffer): ArgExtremumBuffer = {
    if (other.ord != null && better(other.ord, buf.ord)) {
      buf.ord = other.ord
      buf.row = other.row
    }
    buf
  }

  override def eval(buf: ArgExtremumBuffer): Any = buf.row

  override def serialize(buf: ArgExtremumBuffer): Array[Byte] = {
    if (buf.ord == null) Array.emptyByteArray
    else {
      pairRow.update(0, buf.ord)
      pairRow.update(1, buf.row)
      serProj.apply(pairRow).getBytes
    }
  }

  override def deserialize(bytes: Array[Byte]): ArgExtremumBuffer = {
    if (bytes.isEmpty) new ArgExtremumBuffer(null, null)
    else {
      val r = new UnsafeRow(2)
      r.pointTo(bytes, bytes.length)
      new ArgExtremumBuffer(
        r.getStruct(0, ordType.length).copy(),
        r.getStruct(1, rowType.length).copy())
    }
  }

  override def withNewMutableAggBufferOffset(o: Int): ArgExtremumRow =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ArgExtremumRow =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(rowExpr = cs(0), ordExpr = cs(1))
}

object ArgExtremum {
  /** `argmin_row(row, ord)` / `argmax_row(row, ord)` as aggregate Columns. */
  def argRow(row: Column, ord: Column, isMax: Boolean): Column =
    ColumnBridge.column(
      ArgExtremumRow(ColumnBridge.expression(row), ColumnBridge.expression(ord), isMax)
        .toAggregateExpression())
}
