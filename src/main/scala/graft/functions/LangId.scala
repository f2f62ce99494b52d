package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Stopword-voting language ID fused into ONE native expression.
  *
  * Semantics are identical to the column composition
  * `foldRight over when(size(filter(tokens, isin(words))) === best, lang)`:
  * per language, score = number of token OCCURRENCES that are that
  * language's stopwords; result = first language in declaration order
  * (en > de > fr > es) whose score equals the max, "und" when all scores
  * are 0. The composed version re-ran the CodegenFallback tokenizer once
  * per language per `when` branch (~20× per row, 18% of the r1 bench);
  * this expression tokenizes once and takes one hash probe per token.
  */
case class LangIdText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  override def nullSafeEval(v: Any): Any =
    LangIdText.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangIdText.compute($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object LangIdText {
  /** Declaration order IS the tie-break order. */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans"),
    "es" -> Seq("el", "los", "las", "es", "un", "una", "que", "en"))

  private val langs: Array[UTF8String] =
    langStopwords.map(l => UTF8String.fromString(l._1)).toArray
  private val und = UTF8String.fromString("und")

  // vote-table accessors for fused expressions ([[LangQualityKeep]])
  private[functions] def numLangs: Int = langs.length
  private[functions] def langName(i: Int): String = langStopwords(i)._1
  private[functions] def voteMask(token: String): Int = {
    val m = wordMask.get(token)
    if (m == null) 0 else m.intValue()
  }

  // word -> bitmask of languages claiming it (a word may vote for several,
  // e.g. "un" is both French and Spanish)
  private val wordMask: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    langStopwords.zipWithIndex.foreach { case ((_, words), i) =>
      words.foreach { w =>
        val prev = m.get(w)
        m.put(w, Integer.valueOf((if (prev == null) 0 else prev.intValue()) | (1 << i)))
      }
    }
    m
  }

  def compute(text: UTF8String): UTF8String = {
    // one pass over lower(trim(text)).split("\s+") — same dialect as tokens()
    val tokens = text.toLowerCase.trim().toString.split("\\s+")
    val counts = new Array[Int](langs.length)
    var i = 0
    while (i < tokens.length) {
      val m = wordMask.get(tokens(i))
      if (m != null) {
        val v = m.intValue()
        var b = 0
        while (b < langs.length) {
          if (((v >> b) & 1) == 1) counts(b) += 1
          b += 1
        }
      }
      i += 1
    }
    var best = 0
    var bi = -1
    var l = 0
    while (l < langs.length) {
      if (counts(l) > best) { best = counts(l); bi = l } // strict > keeps first max
      l += 1
    }
    if (bi < 0) und else langs(bi)
  }
}
