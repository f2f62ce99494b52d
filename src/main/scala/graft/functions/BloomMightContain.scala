package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
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
  * The sketch ships as a BROADCAST VARIABLE (torrent-distributed, fetched
  * once per executor), NOT as bytes inside the expression tree: an
  * embedded byte array is copied into every plan transform, rendered into
  * plan strings, and serialized with the task binary — at the advertised
  * 10⁹-gram scale (~1.2 GB) that blows task-serialization limits long
  * before the broadcast path breaks a sweat. The expression carries only
  * the small broadcast handle; each executor deserializes the filter once
  * (transient lazy / one-time mutable-state init in generated code) and
  * probes it with one virtual call per row, no boxing.
  */
case class BloomMightContainLong(child: Expression,
                                 filterBc: Broadcast[Array[Byte]])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_long"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBc.value))

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the HANDLE, not the filter: addReferenceObj contents ride
    // the serialized task binary, which is exactly what the broadcast
    // design keeps small
    val bcCls = classOf[Broadcast[_]].getName
    val bfCls = classOf[BloomFilter].getName
    val bcRef = ctx.addReferenceObj("graftBloomBc", filterBc, bcCls)
    // readFrom declares IOException; the init block runs in a method with
    // no throws clause, so the generated code must catch it or Janino
    // rejects the whole class and the plan silently drops to interpreted
    val bloomVar = ctx.addMutableState(bfCls, "graftBloom",
      v => s"""try {
         |  $v = $bfCls.readFrom(
         |    new java.io.ByteArrayInputStream((byte[]) $bcRef.value()));
         |} catch (java.io.IOException e) {
         |  throw new RuntimeException(e);
         |}""".stripMargin)
    defineCodeGen(ctx, ev, c => s"$bloomVar.mightContainLong($c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BloomMightContainLong {
  /** One broadcast per sketch, not per [[column]] call: a caller that
    * probes the same filter from several plans (or re-derives the same
    * Column) must not re-serialize and re-torrent a multi-GB sketch each
    * time. Weak keys — when the caller drops the filter, the entry (and
    * with it the last driver-side handle) goes with it, so the
    * ContextCleaner can reclaim the broadcast blocks.
    */
  private val bcCache =
    new java.util.WeakHashMap[BloomFilter, Broadcast[Array[Byte]]]()

  private def broadcastFor(bloom: BloomFilter): Broadcast[Array[Byte]] =
    bcCache.synchronized {
      val cached = bcCache.get(bloom)
      if (cached != null) cached
      else {
        val baos = new java.io.ByteArrayOutputStream()
        bloom.writeTo(baos)
        val bc = SparkSession.active.sparkContext.broadcast(baos.toByteArray)
        bcCache.put(bloom, bc)
        bc
      }
    }

  /** Column form; the serialized sketch is broadcast through the active
    * session (memoized per filter) and only the handle enters the plan.
    */
  def column(value: Column, bloom: BloomFilter): Column =
    ColumnBridge.column(
      BloomMightContainLong(ColumnBridge.expression(value), broadcastFor(bloom)))
}
