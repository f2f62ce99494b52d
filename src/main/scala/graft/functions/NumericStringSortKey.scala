package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, Decimal, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ORDER-PRESERVING fixed-width sort key for numeric STRINGS: byte order
  * of the key == numeric order of `try_cast(s AS DECIMAL(38,18))`, and the
  * key is null exactly when that cast is null — so an ordering struct can
  * carry this UTF8String field instead of a Decimal and inherit identical
  * ordering semantics (the legacy ConvertToDecimal contract,
  * AggregationEngine.cs:75-87).
  *
  * Why: inside [[ArgExtremum]]'s ObjectHashAggregate the ordering struct
  * is evaluated interpreted per row and compared per candidate; a
  * DECIMAL(38,18) field pays a BigDecimal parse + 16-byte scaled-decimal
  * comparisons there (q_argmin_strnum ran ~4× its native-typed twin). The
  * key is built in ONE pass by Spark's own decimal parser (`Decimal
  * .fromString` + `toPrecision` — bit-identical accept/reject/rounding to
  * the cast) and compares as a memcmp.
  *
  * Encoding (39 ASCII bytes): sign byte '0' (neg) / '1' (zero) / '2'
  * (pos), then the 38-digit zero-padded |unscaled| at scale 18 — 9's
  * complement for negatives so their order reverses. Lexicographic byte
  * order equals numeric order; equal decimals ("1.0", "01") collapse to
  * equal keys, preserving tie behavior.
  */
case class NumericStringSortKey(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "numeric_string_sort_key"

  override def nullSafeEval(v: Any): Any =
    NumericStringSortKey.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      UTF8String ${ev.value}Tmp = graft.functions.NumericStringSortKey.compute($c);
      if (${ev.value}Tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Tmp; }
    """)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object NumericStringSortKey {
  private val Precision = 38
  private val Scale = 18

  def compute(s: UTF8String): UTF8String = {
    val fast = fastIntegerKey(s)
    if (fast != null) return fast
    val parsed = Decimal.fromString(s)
    if (parsed == null) return null
    // same rounding/overflow contract as the cast: HALF_UP to scale 18,
    // null when the value exceeds precision 38
    if (!parsed.changePrecision(Precision, Scale)) return null
    val unscaled = parsed.toJavaBigDecimal.unscaledValue()
    val neg = unscaled.signum() < 0
    val digits = unscaled.abs().toString
    val out = new Array[Byte](Precision + 1)
    out(0) = if (unscaled.signum() == 0) '1' else if (neg) '0' else '2'
    val pad = Precision - digits.length
    var i = 0
    while (i < Precision) {
      val ch = if (i < pad) '0' else digits.charAt(i - pad)
      out(i + 1) = (if (neg) '9' - ch + '0' else ch).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Fast path for PLAIN INTEGER strings (optional sign + 1..20 ASCII
    * digits, nothing else — by far the common shape of numeric-string
    * columns): the key is emitted directly from the digit bytes, no
    * Decimal/BigDecimal materialization. The unscaled value at scale 18
    * is just the digits followed by 18 zeros, and >20 significant digits
    * overflows precision 38 → null, exactly the slow path's contract.
    * Returns null when the shape doesn't apply (caller falls through to
    * the exact-parity slow path — which also handles whitespace,
    * fractions, exponents, and garbage).
    */
  private def fastIntegerKey(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    if (n == 0 || n > 21) return null
    val b = s.getBytes
    val hasSign = b(0) == '-' || b(0) == '+'
    val digStart = if (hasSign) 1 else 0
    if (n == digStart || n - digStart > 20) return null
    var i = digStart
    while (i < n) {
      val c = b(i)
      if (c < '0' || c > '9') return null
      i += 1
    }
    var firstSig = digStart
    while (firstSig < n - 1 && b(firstSig) == '0') firstSig += 1
    val isZero = b(firstSig) == '0'
    val neg = !isZero && b(0) == '-'
    val sig = n - firstSig // significant digits (1..20)
    val out = new Array[Byte](Precision + 1)
    out(0) = if (isZero) '1' else if (neg) '0' else '2'
    // layout: [pad zeros][significant digits][18 zeros] = 38 positions
    val pad = Precision - Scale - sig
    i = 0
    while (i < Precision) {
      val ch: Int =
        if (i < pad) '0'
        else if (i < pad + sig) b(firstSig + (i - pad))
        else '0'
      out(i + 1) = (if (neg) '9' - ch + '0' else ch).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}
