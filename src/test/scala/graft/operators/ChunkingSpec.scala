package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("chunkByTokens emits overlapping windows with partial tails, skips empty docs") {
    val docs = Seq((1L, "a b c d e f g"), (2L, "x y"), (3L, "")).toDF("doc_id", "text")
    val got = Chunking.chunkByTokens(docs, "doc_id", "text", chunkTokens = 4, stride = 3)
      .as[(Long, Long, String, Long)].collect().toSeq.sorted
    assert(got == Seq(
      (1L, 0L, "a b c d", 4L),
      (1L, 1L, "d e f g", 4L),
      (1L, 2L, "g", 1L),     // partial tail
      (2L, 0L, "x y", 2L)))  // doc 3 produces nothing
  }

  test("chunkByBpeTokens windows real subwords; concatenation reconstructs the stream") {
    val v = graft.functions.BpeVocab(Seq(("l", "o"), ("lo", "w")))
    val docs = Seq((1L, "low low low low low"), (3L, "")).toDF("doc_id", "text")
    val got = Chunking.chunkByBpeTokens(docs, "doc_id", "text",
        chunkTokens = 4, stride = 4, vocab = v)
      .as[(Long, Long, String, Long)].collect().toSeq.sorted
    // subwords: ["low", " ", "low", " ", "low", " ", "low", " ", "low"] (9)
    assert(got == Seq(
      (1L, 0L, "low low ", 4L),
      (1L, 1L, "low low ", 4L),
      (1L, 2L, "low", 1L))) // tail; empty doc emits nothing
    assert(got.map(_._3).mkString == "low low low low low")
    // budgets in merged tokens: the pack counter variant agrees with the
    // chunker's own n_tokens denominations
    val packed = Chunking.packByTokenBudget(
      docs.filter($"doc_id" === 1L), Seq("doc_id"), "text",
      budgetTokens = 4L, bucketSize = 10L,
      tokenCounter = c => graft.functions.TextFunctions.bpeTokenCount(c, v))
    assert(packed.select("n_tokens").as[Long].head() == 9L)
  }

  test("chunkByTokens plans without shuffles (narrow transformation)") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = Chunking.chunkByTokens(docs, "doc_id", "text", 4, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("packByTokenBudget reproduces the single-window global prefix sum exactly") {
    // ragged token counts, ids straddling several buckets
    val docs = (0L until 200L).map(i => (i, ("w " * (1 + (i * 7 % 23)).toInt).trim))
      .toDF("doc_id", "text").repartition(7)
    val got = Chunking.packByTokenBudget(docs, "doc_id", "text",
        budgetTokens = 100, bucketSize = 30)
      .select("doc_id", "n_tokens", "pack_id")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    val expected = docs
      .withColumn("n_tokens", graft.functions.TextFunctions.tokenCount(col("text")))
      .withColumn("before", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("pack_id", expr("before div 100"))
      .select("doc_id", "n_tokens", "pack_id")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(got == expected)
    assert(expected.map(_._3).distinct.size > 5) // actually spans many packs
  }

  test("composite-order packing (doc, chunk) matches the single-window reference") {
    val docs = (0L until 40L).map(i => (i, ("w " * (3 + (i * 5 % 17)).toInt).trim))
      .toDF("doc_id", "text").repartition(5)
    val chunks = Chunking.chunkByTokens(docs, "doc_id", "text", 4, 4)
    val got = Chunking.packByTokenBudget(chunks, Seq("doc_id", "chunk_id"),
        "chunk_text", budgetTokens = 11, bucketSize = 7)
      .select("doc_id", "chunk_id", "pack_id")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val w = Window.orderBy("doc_id", "chunk_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = chunks
      .withColumn("n_tokens", graft.functions.TextFunctions.tokenCount(col("chunk_text")))
      .withColumn("before", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("pack_id", expr("before div 11"))
      .select("doc_id", "chunk_id", "pack_id")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(got == expected)
    assert(expected.map(_._3).distinct.size > 3)
  }

  test("packByTokenBudget rejects a non-numeric leading order column") {
    val docs = Seq(("a", "x y"), ("b", "z")).toDF("sid", "text")
    val e = intercept[IllegalArgumentException] {
      Chunking.packByTokenBudget(docs, Seq("sid"), "text", 10, 5)
    }
    assert(e.getMessage.contains("must be numeric"))
  }

  test("packByTokenBudget never windows over a single global partition") {
    val docs = Seq((1L, "a b"), (2L, "c")).toDF("doc_id", "text")
    val plan = Chunking.packByTokenBudget(docs, "doc_id", "text", 10, 1)
      .queryExecution.optimizedPlan.toString
    // the only global (empty-partition-spec) window must be over the
    // bucket-sum aggregate, never over the input rows
    val globalWindows = plan.linesIterator.filter(l =>
      l.contains("Window") && !l.contains("partitionBy") &&
        l.contains("__bucket_sum")).toSeq
    assert(globalWindows.nonEmpty, plan)
  }
}
