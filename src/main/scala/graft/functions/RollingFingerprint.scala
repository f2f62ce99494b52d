package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken): Rabin–Karp
  * rolling hashes over byte k-grams, locally minimized over windows of `w`
  * consecutive hashes. Two documents sharing any sufficiently long substring
  * share fingerprints — the standard plagiarism/near-copy detector that
  * md5-style whole-document hashing can't provide.
  *
  * Output is a sorted-distinct `array<long>` suitable for the same
  * bucket-join candidate generation the other dedup operators use.
  */
case class RollingFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_fingerprint"

  override def nullSafeEval(v: Any): Any =
    RollingFingerprint.compute(v.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingFingerprint.compute($c, $k, $w)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object RollingFingerprint {
  private final val Base = 1000003L

  def compute(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    // Rabin-Karp over byte k-grams (wrapping 64-bit arithmetic)
    val nHashes = n - k + 1
    val hashes = new Array[Long](nHashes)
    var h = 0L
    var pow = 1L
    var i = 0
    while (i < k) { h = h * Base + (bytes(i) & 0xffL); i += 1 }
    i = 1; while (i < k) { pow *= Base; i += 1 }
    hashes(0) = h
    i = 1
    while (i < nHashes) {
      h = (h - (bytes(i - 1) & 0xffL) * pow) * Base + (bytes(i + k - 1) & 0xffL)
      hashes(i) = h
      i += 1
    }
    // winnowing: min of each window of w consecutive hashes, dedup
    val seen = new java.util.TreeSet[java.lang.Long]()
    if (nHashes <= w) {
      var m = hashes(0); i = 1
      while (i < nHashes) { if (hashes(i) < m) m = hashes(i); i += 1 }
      seen.add(m)
    } else {
      i = 0
      while (i + w <= nHashes) {
        var m = hashes(i); var j = i + 1
        while (j < i + w) { if (hashes(j) < m) m = hashes(j); j += 1 }
        seen.add(m)
        i += 1
      }
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  def column(text: Column, k: Int = 9, w: Int = 4): Column =
    ColumnBridge.column(RollingFingerprint(ColumnBridge.expression(text), k, w))
}
