package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** One-pass MinHash signature of a shingle set.
  *
  * Each shingle is hashed ONCE (FNV-1a 64), and the `numHashes` hash family
  * is derived by Kirsch–Mitzenmacher double hashing `g_i = h1 + i·h2` — the
  * standard trick that keeps LSH quality while doing O(1) real hashes per
  * element. A naive `transform(seeds, s -> min(hash(shingle, s)))`
  * composition re-hashes every shingle per seed AND gets re-inlined by
  * Catalyst into every consumer (band structs, join sides) — measured 60×
  * slower at bench scale.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(v: Any): Any =
    MinHashSignature.compute(v.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSignature.compute($c, $numHashes)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHashSignature {
  def compute(shingles: ArrayData, numHashes: Int): ArrayData = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      if (s != null) {
        val bytes = s.getBytes
        val h1 = SimHash64.fnv1a64(bytes)
        // second independent hash: FNV with a different offset basis
        var h2 = 0x6c62272e07bb0142L
        var j = 0
        while (j < bytes.length) { h2 ^= (bytes(j) & 0xffL); h2 *= 0x100000001b3L; j += 1 }
        var k = 0
        var g = h1
        while (k < numHashes) {
          if (g < mins(k)) mins(k) = g
          g += h2 // g_k = h1 + k*h2, wrapping
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

object MinHashFunctions {
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(shingles), numHashes))
}
