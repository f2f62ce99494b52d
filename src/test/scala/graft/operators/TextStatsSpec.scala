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
}
