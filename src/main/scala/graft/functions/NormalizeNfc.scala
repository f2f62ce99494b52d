package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC (canonical composition) normalization as a native codegen'd
  * expression — the missing piece of text canonicalization for dedup: two
  * renderings of "café" (precomposed U+00E9 vs e + combining U+0301) must
  * hash to the same fingerprint or every accent-carrying near-duplicate
  * escapes exact dedup.
  *
  * Spark ships no NFC builtin; a Scala UDF here would break whole-stage
  * codegen in the hottest pass of a corpus sweep. The expression fast-paths
  * the overwhelmingly common case: `Normalizer.isNormalized` is a cheap
  * scan that allocates nothing, and ASCII (most of a web corpus after
  * lowering) is always already NFC — only rows that actually carry
  * decomposed sequences pay for re-composition.
  */
case class NormalizeNfc(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc"

  override def nullSafeEval(v: Any): Any =
    NormalizeNfc.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeNfc.compute($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object NormalizeNfc {
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
