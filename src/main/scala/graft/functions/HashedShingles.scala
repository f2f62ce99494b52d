package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SORTED distinct 64-bit hashes of the word k-shingles of a text column,
  * in one pass — the whole per-document input of a set-similarity join
  * (PPJoin-style) fused into a single expression.
  *
  * Replaces the r1 pipeline `explode(shingles) → xxhash64 → global df
  * groupBy → join → collect_list → sort_array` (68 s / 47% of the sf0.1
  * bench): prefix filtering is exact under ANY fixed global total order of
  * the universe, so ordering by the hash VALUE itself — computable per row
  * with no shuffle — replaces the document-frequency order at zero cost.
  * The df order minimizes candidate volume; the hash order is
  * frequency-blind, but it deletes two full-corpus shuffles and a per-doc
  * sort, which dominates at every scale we measured. Shingles hash FNV-1a
  * over the space-joined token window; the ~2⁻⁶⁴ collision rate is the same
  * approximation the hashed r1 pipeline already accepted.
  */
case class HashedShingles(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_shingles"

  override def nullSafeEval(v: Any): Any =
    HashedShingles.compute(v.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashedShingles.compute($c, $k)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object HashedShingles {
  private val FnvOffset = 0xcbf29ce484222325L
  private val FnvPrime = 0x100000001b3L

  def compute(text: UTF8String, k: Int): ArrayData = {
    val tokens = text.toLowerCase.trim().toString.split("\\s+").filter(_.nonEmpty)
    if (tokens.length < k)
      return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    // pre-hash the bytes of each token once; combine per window
    val utf = new Array[Array[Byte]](tokens.length)
    var t = 0
    while (t < tokens.length) {
      utf(t) = tokens(t).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      t += 1
    }
    val set = new java.util.TreeSet[java.lang.Long]() // distinct + ascending
    var i = 0
    while (i + k <= tokens.length) {
      var h = FnvOffset
      var j = i
      while (j < i + k) {
        if (j > i) { h ^= ' '.toLong; h *= FnvPrime } // the " " joiner
        val bs = utf(j)
        var b = 0
        while (b < bs.length) { h ^= (bs(b) & 0xffL); h *= FnvPrime; b += 1 }
        j += 1
      }
      set.add(h)
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var n = 0
    while (it.hasNext) { out(n) = it.next(); n += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def column(text: Column, k: Int): Column =
    ColumnBridge.column(HashedShingles(ColumnBridge.expression(text), k))
}
