package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of a 64-bit key against a pre-built Bloom filter,
  * embedded in the plan as a codegen'd predicate.
  *
  * Purpose: SEMI-JOIN PUSHDOWN for joins whose build side outgrows the
  * broadcast-hash-relation budget but whose *approximate* membership set
  * does not — a Bloom filter costs ~10 bits per key at 1% FP (vs ~30+
  * bytes/entry for a broadcast hash map), so a build side of 10⁹ grams is
  * a ~1.2 GB sketch where the hash relation would be tens of GB. The probe
  * has NO false negatives, so `filter(bloom) → exact equi-join` returns
  * exactly the unfiltered join's rows; the filter only shrinks the stream
  * side *before* the shuffle (typically by 1/fpp for probe keys not in the
  * build side), which is where a 100 TB corpus-side scan wins.
  *
  * The serialized sketch travels in the expression (`filterBytes`) and is
  * deserialized once per executor JVM (transient lazy); generated code
  * probes the deserialized `BloomFilter` via a codegen reference — one
  * virtual call per row, no boxing.
  */
case class BloomMightContainLong(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_long"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$bf.mightContainLong($c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BloomMightContainLong {
  /** Column form; `bloom` is serialized into the plan. */
  def column(value: Column, bloom: BloomFilter): Column = {
    val baos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(baos)
    ColumnBridge.column(
      BloomMightContainLong(ColumnBridge.expression(value), baos.toByteArray))
  }
}
