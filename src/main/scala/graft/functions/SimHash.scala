package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over a token array — Charikar's similarity hash: documents
  * with small Hamming distance between their SimHashes are near-duplicates.
  *
  * Native Catalyst expression (interpreted eval + codegen via a static
  * helper) so the per-token × 64-bit inner loop runs unboxed inside
  * whole-stage codegen.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(v: Any): Any =
    SimHash64.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** SimHash straight from TEXT: tokenizes (lower/trim/\s+ split) inside the
  * expression. The `simhash64(tokens(text))` composition drags the
  * CodegenFallback higher-order `filter`/`split` lambdas into the hot path —
  * one fused native pass is ~10× faster on long documents.
  */
case class SimHashText(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_text"

  override def nullSafeEval(v: Any): Any =
    SimHash64.computeText(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.computeText($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SimHash64 {
  /** FNV-1a 64-bit over UTF-8 bytes — stable, dependency-free token hash. */
  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  def compute(tokens: ArrayData): Long = {
    val acc = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null) {
        val h = fnv1a64(t.getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Convenience for tests. */
  def ofStrings(tokens: Seq[String]): Long =
    compute(ArrayData.toArrayData(tokens.map(UTF8String.fromString).toArray))

  /** Tokenize (lower, trim, split on \s+) and simhash in one pass. */
  def computeText(text: UTF8String): Long = {
    val tokens = text.toLowerCase.trim().toString.split("\\s+").filter(_.nonEmpty)
    val acc = new Array[Int](64)
    var i = 0
    while (i < tokens.length) {
      val h = fnv1a64(tokens(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

object SimHashFunctions {
  /** SimHash of a token-array column. */
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))

  /** SimHash of a raw text column (fused tokenize + hash). */
  def simhashText(text: Column): Column =
    ColumnBridge.column(SimHashText(ColumnBridge.expression(text)))
}
