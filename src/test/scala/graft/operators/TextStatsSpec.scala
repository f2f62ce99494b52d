package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    ("en", "the cat and the hat"),
    ("en", "the cat sat"),
    ("de", "der der die das"),
    ("de", "")
  ).toDF("lang", "text")

  test("topTokensPerGroup equals the window formulation, count desc then token asc") {
    val counts = docs.select(col("lang"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
      .groupBy("lang", "token").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("lang").orderBy(col("cnt").desc, col("token"))
    val expected = counts.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 2)
      .select("lang", "token", "cnt", "rank")
      .as[(String, String, Long, Long)].collect().sorted.toSeq
    val got = TextStats.topTokensPerGroup(docs, Seq("lang"), col("text"), k = 2)
      .as[(String, String, Long, Long)].collect().sorted.toSeq
    assert(got == expected)
    assert(got.contains(("en", "the", 3L, 1L))) // 'the' wins en
    assert(got.contains(("de", "der", 2L, 1L))) // 'der' wins de
  }

  test("topTokensPerGroup avoids window sorts (two hash aggregates)") {
    val plan = TextStats.topTokensPerGroup(docs, Seq("lang"), col("text"), k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("repetitionSignals: duplicate lines and dominant bigrams, zero-safe") {
    val rep = Seq(
      // 4 non-blank lines, 2 of them repeats of "spam spam"; bigrams of
      // "spam spam spam spam a" = [spam spam ×3, spam a] → top 3/4
      (1L, "spam spam\nspam spam\n\nspam spam\nunique line a"),
      (2L, "all distinct lines\nno repeats here"), // top bigram ties at 1
      (3L, "one"),                                 // 1 token → no bigrams
      (4L, "")                                     // empty → all zeros
    ).toDF("doc_id", "text")
    val got = TextStats.repetitionSignals(rep, "doc_id", "text")
      .as[(Long, Long, Double, Long, Double)].collect().sortBy(_._1).toSeq
    val (id1, n1, dup1, nb1, top1) = got(0)
    assert((id1, n1, nb1) == (1L, 4L, 8L))
    assert(dup1 == 0.5) // 2 repeated lines of 4
    // tokenization sees newlines as whitespace: 6×spam + unique line a =
    // 9 tokens → 8 bigrams, "spam spam" 5 of them
    assert(top1 == 5.0 / 8.0)
    assert(got(2) == ((3L, 1L, 0.0, 0L, 0.0)))
    assert(got(3) == ((4L, 0L, 0.0, 0L, 0.0)))
  }
}
