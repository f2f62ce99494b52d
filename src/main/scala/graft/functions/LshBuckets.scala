package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Multi-table random-hyperplane LSH bucket codes of a float-vector column,
  * one native pass.
  *
  * Returns `array<long>` of length `tables`; element t encodes
  * `(t << 32) | signPattern(table t's planes)` so the (table, bucket)
  * composite is ONE primitive join key after `explode`. Hyperplanes are
  * seeded Gaussians generated deterministically from (planes, tables, seed,
  * dim) — executors regenerate them once and cache statically, so nothing
  * but three ints rides the plan.
  *
  * The `functions._` composition (`aggregate(zip_with(...))` per plane) is
  * CodegenFallback and re-boxes the vector per plane; this expression reads
  * the vector once and does planes×tables fused dot products.
  */
case class LshBucketCodes(child: Expression, planes: Int, tables: Int, seed: Long)
    extends UnaryExpression {

  require(planes > 0 && planes <= 32, "planes must be in [1,32] (bucket code packs into 32 bits)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_bucket_codes"

  override def nullSafeEval(v: Any): Any =
    LshBucketCodes.compute(v.asInstanceOf[ArrayData], planes, tables, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LshBucketCodes.compute($c, $planes, $tables, ${seed}L)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object LshBucketCodes {
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Long, Int), Array[Array[Double]]]()

  /** tables × planes hyperplanes, flattened; deterministic per (p,t,seed,dim). */
  def planesFor(planes: Int, tables: Int, seed: Long, dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((planes, tables, seed, dim), _ => {
      val rng = new scala.util.Random(seed)
      Array.fill(tables * planes)(Array.fill(dim)(rng.nextGaussian()))
    })

  def compute(vec: ArrayData, planes: Int, tables: Int, seed: Long): ArrayData = {
    val n = vec.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) { v(i) = vec.getFloat(i).toDouble; i += 1 }
    val hp = planesFor(planes, tables, seed, n)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var code = 0L
      var p = 0
      while (p < planes) {
        val plane = hp(t * planes + p)
        var dot = 0.0
        var d = 0
        while (d < n) { dot += v(d) * plane(d); d += 1 }
        if (dot >= 0) code |= (1L << p)
        p += 1
      }
      out(t) = (t.toLong << 32) | code
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def column(vec: Column, planes: Int, tables: Int, seed: Long): Column =
    ColumnBridge.column(LshBucketCodes(ColumnBridge.expression(vec), planes, tables, seed))
}
