package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The curation pipeline's language+quality admission predicate fused into
  * ONE native expression:
  *
  *   langId(text) ∈ keepLangs  AND  qualityScore(text) ≥ minQuality
  *
  * Composed from [[TextFunctions.langId]] + [[TextFunctions.qualityScore]]
  * the two filters tokenize the text twice, and the quality side's
  * higher-order-function chain (`size(filter(tokens, …))`) is
  * CodegenFallback — interpreted per row in the hottest stage of the
  * pipeline. This expression makes ONE pass: tokenize once, per token one
  * stopword-set probe (quality numerator) and one language-vote mask probe
  * ([[LangIdText]]'s table), then the exact double arithmetic of
  * `qualityScore` — SAME operation order, so results are bit-identical to
  * the composed predicate (spec-pinned in FunctionsSpec, and the
  * oracle-gated pipeline rows agree end-to-end).
  *
  * NULL text: Spark's `least`/`greatest` SKIP null children, so the
  * composed `qualityScore(null)` does not propagate NULL — every ratio is
  * NULL, each `least(NULL, 1.0)` collapses to 1.0, and the score
  * degenerates to the constant 0.4 + 0.4 + 0.0 = 0.8; meanwhile
  * `langId(null)` coalesces to "und". This expression reproduces that
  * exactly (`nullResult` = "und" ∈ keepLangs ∧ 0.8 ≥ minQuality):
  * equality with the composed predicate on ALL inputs beats a silently
  * different null policy. Callers who want null documents gone should
  * drop them explicitly — both forms of this filter keep them whenever
  * "und" is an admitted language.
  */
case class LangQualityKeep(child: Expression, keepLangs: Seq[String],
                           minQuality: Double) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "lang_quality_keep"

  private val keepSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    keepLangs.foreach(s.add)
    s
  }

  def compute(text: UTF8String): Boolean = {
    // punct count over code points (regexp_count(text, "[.,!?;:]"))
    val str = text.toString
    var punct = 0L
    var ci = 0
    while (ci < str.length) {
      val c = str.charAt(ci)
      if (c == '.' || c == ',' || c == '!' || c == '?' || c == ';' || c == ':')
        punct += 1
      ci += 1
    }
    // one tokenization, same dialect as TextFunctions.tokens /
    // LangIdText.compute: lower → trim → split("\s+"), empties skipped
    val tokens = text.toLowerCase.trim().toString.split("\\s+")
    var nToks = 0L
    var nStop = 0L
    val votes = new Array[Int](LangIdText.numLangs)
    var i = 0
    while (i < tokens.length) {
      val t = tokens(i)
      if (t.nonEmpty) {
        nToks += 1
        if (LangQualityKeep.stopwordSet.contains(t)) nStop += 1
        val m = LangIdText.voteMask(t)
        if (m != 0) {
          var b = 0
          while (b < LangIdText.numLangs) {
            if (((m >> b) & 1) == 1) votes(b) += 1
            b += 1
          }
        }
      }
      i += 1
    }
    // EXACT qualityScore arithmetic (operation order preserved):
    // the numerators are INTs cast to double, one division per ratio
    val len = text.numChars().toDouble
    val pr = if (len == 0) 0.0 else punct.toDouble / len
    val sr = if (nToks == 0) 0.0 else nStop.toDouble / nToks.toDouble
    val lenSignal = math.min(len / 500.0, 1.0)
    val fluency = math.min(sr * 4.0, 1.0)
    val noise = math.min(pr * 10.0, 1.0)
    val q = math.max(
      math.min(lenSignal * 0.4 + fluency * 0.4 + (1.0 - noise) * 0.2, 1.0), 0.0)
    if (q < minQuality) return false
    var best = 0
    var bi = -1
    var l = 0
    while (l < LangIdText.numLangs) {
      if (votes(l) > best) { best = votes(l); bi = l }
      l += 1
    }
    keepSet.contains(if (bi < 0) "und" else LangIdText.langName(bi))
  }

  /** The composed predicate's value on NULL text (see the class doc). */
  def nullResult: Boolean = keepSet.contains("und") && 0.8 >= minQuality

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) nullResult else compute(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langQualityKeep", this)
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        boolean ${ev.value} = ${childGen.isNull} ?
          $ref.nullResult() : $ref.compute(${childGen.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object LangQualityKeep {
  /** TextFunctions.stopwordsEn as a probe set (the QUALITY numerator's
    * 10-word list — distinct from the langid vote tables).
    */
  private[functions] val stopwordSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    TextFunctions.stopwordsEn.foreach(s.add)
    s
  }
}
