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

/** Native equal-position count of two `array<bigint>` signatures — the
  * verify kernel of every MinHash candidate join. The composed form
  * `size(filter(zip_with(s1, s2, (x, y) -> x === y), p -> p))` walks an
  * interpreted higher-order expression tree per element and allocates TWO
  * intermediate arrays per candidate pair (the zip_with booleans and the
  * filter survivors) — paid once per (id1, id2) candidate in every
  * near-dup verify across the dedup family. Semantics mirror the HOF form
  * exactly so estimates are bit-equal: zip_with pads the shorter side
  * with nulls, `x === y` over a null is null, and `filter(p -> p)` keeps
  * strict trues — i.e. the count over the COMMON prefix of positions
  * where both elements are non-null and equal.
  */
case class SigMatchCount(left: Expression,
                         right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sig_match_count"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<bigint> signature columns, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    SigMatchCount.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SigMatchCount.compute($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SigMatchCount {
  /** Shared by interpreted eval and generated code. */
  def compute(x: ArrayData, y: ArrayData): Int = {
    val n = math.min(x.numElements(), y.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i))
        c += 1
      i += 1
    }
    c
  }
}

object MinHashFunctions {
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(shingles), numHashes))

  /** Equal-position count of two signature columns, as a codegen'd native
    * expression (HOF-equivalent semantics — see [[SigMatchCount]]).
    */
  def sigMatchCount(a: Column, b: Column): Column =
    ColumnBridge.column(SigMatchCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
