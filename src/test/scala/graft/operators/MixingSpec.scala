package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class MixingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (0L until 300L).map { i =>
    val src = Seq("web", "books", "code")(i.toInt % 3)
    (i, src, ("w " * (1 + (i * 11 % 37)).toInt).trim)
  }.toDF("doc_id", "source", "text").repartition(7)

  private val weights = Map("web" -> 0.5, "books" -> 0.5)

  test("allocateByTokenBudget == the single-window per-source reference") {
    val budget = 800L
    val got = Mixing.allocateByTokenBudget(docs, "doc_id", "text", "source",
        weights, budget)
      .as[(Long, String, Long)].collect().sorted.toSeq
    val w = Window.partitionBy("source").orderBy(md5(col("text")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = docs
      .withColumn("n_tokens", graft.functions.TextFunctions.tokenCount(col("text")))
      .withColumn("alloc",
        when(col("source") === "web", lit(400L))
          .when(col("source") === "books", lit(400L)).otherwise(lit(0L)))
      .withColumn("before", coalesce(sum("n_tokens").over(w), lit(0L)))
      .filter(col("alloc") > 0 && col("before") + col("n_tokens") <= col("alloc"))
      .select("doc_id", "source", "n_tokens")
      .as[(Long, String, Long)].collect().sorted.toSeq
    assert(got == expected)
    assert(got.nonEmpty && got.size < 200) // a real partial selection
  }

  test("per-source token totals never exceed the allocation; zero-weight sources vanish") {
    val got = Mixing.allocateByTokenBudget(docs, "doc_id", "text", "source",
      weights, totalBudget = 500L)
    val totals = got.groupBy("source").agg(sum("n_tokens").as("t"))
      .as[(String, Long)].collect().toMap
    assert(totals.keySet.subsetOf(Set("web", "books"))) // no "code"
    assert(totals.values.forall(_ <= 250L))
  }

  test("the only unbounded-partition window runs over the bucket-sum table") {
    val plan = Mixing.allocateByTokenBudget(docs, "doc_id", "text", "source",
        weights, 500L)
      .queryExecution.optimizedPlan.toString
    val badWindows = plan.linesIterator.filter(l =>
      l.contains("Window") && l.contains("n_tokens#") &&
        !l.contains("__bucket")).toSeq
    assert(badWindows.isEmpty, plan)
  }
}
