package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence-shaping operators for LLM training pipelines: split long
  * documents into token windows, and pack documents into fixed token-budget
  * bins.
  */
object Chunking {

  /** Overlapping token-window chunks: each document splits into windows of
    * `chunkTokens` tokens starting every `stride` tokens (partial tail
    * windows included; empty documents produce no chunks).
    *
    * Pure narrow transformation — tokenize once, `transform` over the start
    * offsets, one `posexplode` — all codegen'd built-ins, embarrassingly
    * parallel, nothing shuffles.
    */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0 && stride > 0, "chunkTokens and stride must be positive")
    df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col(idCol),
        posexplode(transform(
          sequence(lit(0), size(col("__toks")) - 1, lit(stride)),
          start => slice(col("__toks"), start + 1, lit(chunkTokens))))
          .as(Seq("chunk_id", "__chunk")))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        array_join(col("__chunk"), " ").as("chunk_text"),
        size(col("__chunk")).cast("long").as("n_tokens"))
  }

  /** [[chunkByTokens]] denominated in REAL BPE tokens: windows count
    * `chunkTokens` SUBWORDS of the vocab's merge table
    * ([[graft.functions.BpeEncode]]) instead of whitespace words — the
    * unit an LLM context budget is actually measured in. `chunk_text` is
    * the concatenation of the window's subwords (subwords carry their
    * leading spaces, so concatenation reconstructs the exact pretoken
    * stream — no separator injected). Same narrow no-shuffle plan.
    */
  def chunkByBpeTokens(df: DataFrame, idCol: String, textCol: String,
                       chunkTokens: Int, stride: Int,
                       vocab: graft.functions.BpeVocab = graft.functions.BpeVocab.bundled)
      : DataFrame = {
    require(chunkTokens > 0 && stride > 0, "chunkTokens and stride must be positive")
    df.select(col(idCol), TextFunctions.bpeEncode(col(textCol), vocab).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col(idCol),
        posexplode(transform(
          sequence(lit(0), size(col("__toks")) - 1, lit(stride)),
          start => slice(col("__toks"), start + 1, lit(chunkTokens))))
          .as(Seq("chunk_id", "__chunk")))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        array_join(col("__chunk"), "").as("chunk_text"),
        size(col("__chunk")).cast("long").as("n_tokens"))
  }

  /** Contiguous-fill sequence packing: documents, taken in `orderCol`
    * order, are assigned to consecutive bins of `budgetTokens` tokens;
    * `pack_id = floor(tokens_before / budget)` where `tokens_before` is the
    * exact global running token total of all preceding documents.
    *
    * The global prefix sum is computed DISTRIBUTED, textbook two-level:
    * coarse buckets of `orderCol` (`floor(order / bucketSize)`) aggregate
    * their token sums (one hash aggregate); bucket prefix offsets are a
    * window over the TINY bucket-sum table (rows = n_buckets, not n_docs);
    * offsets broadcast-join back and a within-bucket window finishes the
    * per-document running total. No single task ever sorts or scans the
    * full corpus — the classic `sum() OVER (ORDER BY ...)` formulation
    * plans as ONE partition holding every row, which is exactly what dies
    * first at 100 TB.
    */
  def packByTokenBudget(df: DataFrame, orderCol: String, textCol: String,
                        budgetTokens: Long, bucketSize: Long = 1000L): DataFrame =
    packByTokenBudget(df, Seq(orderCol), textCol, budgetTokens, bucketSize)

  /** Composite-key variant: global order is LEXICOGRAPHIC over `orderCols`
    * (e.g. `(doc_id, chunk_id)`) — no fused numeric key, so no overflow and
    * no silent collision cap. Only the FIRST column buckets the coarse
    * prefix sum (it must be numeric and must dominate the order, which a
    * lexicographic key guarantees); the within-bucket window orders by the
    * full composite.
    */
  def packByTokenBudget(df: DataFrame, orderCols: Seq[String], textCol: String,
                        budgetTokens: Long, bucketSize: Long): DataFrame =
    packByTokenBudget(df, orderCols, textCol, budgetTokens, bucketSize,
      TextFunctions.tokenCount)

  /** Counter-parameterized variant: `tokenCounter` maps the text column to
    * its BIGINT token count — pass
    * `TextFunctions.bpeTokenCount(_, vocab)` to denominate the budget in
    * REAL merged tokens instead of whitespace words. Plan unchanged.
    */
  def packByTokenBudget(df: DataFrame, orderCols: Seq[String], textCol: String,
                        budgetTokens: Long, bucketSize: Long,
                        tokenCounter: org.apache.spark.sql.Column =>
                          org.apache.spark.sql.Column): DataFrame = {
    require(budgetTokens > 0 && bucketSize > 0, "budget and bucketSize must be positive")
    require(orderCols.nonEmpty, "at least one order column required")
    require(df.schema(orderCols.head).dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"leading order column '${orderCols.head}' must be numeric " +
        "(it buckets the distributed prefix sum)")
    val withN = df
      .withColumn("n_tokens", tokenCounter(col(textCol)))
    withRunningTotal(withN, floor(col(orderCols.head) / bucketSize),
        orderCols.map(col), "n_tokens")
      // integral div, not floor(double /): a double quotient can misround
      // at exact bin boundaries once running totals pass 2^53-scale math
      .withColumn("pack_id", expr(s"__before div $budgetTokens"))
      .drop("__before")
  }

  /** Appends `__before` — the EXCLUSIVE global running total of
    * `valueCol` in the total order (`bucket` asc, then `orderCols`) — via
    * the textbook two-level distributed prefix sum shared by
    * [[packByTokenBudget]] and
    * [[Sampling.selectTopUnderTokenBudget]]. `bucket` MUST be a monotone
    * coarsening of the caller's order (`bucket(a) < bucket(b)` ⇒ a
    * precedes b); within a bucket the window orders by `orderCols`, so
    * quantization affects only BALANCE, never correctness. No single task
    * ever sorts or scans the full input — the classic
    * `sum() OVER (ORDER BY …)` formulation plans as ONE partition holding
    * every row, which is exactly what dies first at 100 TB.
    */
  private[operators] def withRunningTotal(df: DataFrame, bucket: Column,
      orderCols: Seq[Column], valueCol: String): DataFrame = {
    val withB = df.withColumn("__bucket", bucket)
    val bucketSums = withB.groupBy("__bucket")
      .agg(sum(col(valueCol)).as("__bucket_sum"))
    // window over n_buckets rows — orders of magnitude smaller than the
    // data. The constant partition key makes the single-partition intent
    // explicit (this summary table is tiny BY CONSTRUCTION) and keeps
    // Spark's "no partition defined" WARN out of logs where it would
    // mask real unbounded-window mistakes.
    val bucketOffsets = bucketSums
      .withColumn("__bucket_offset",
        coalesce(sum(col("__bucket_sum"))
          .over(Window.partitionBy(lit(0))
            .orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("__bucket", "__bucket_offset")
    val withinBucket = Window.partitionBy("__bucket")
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    withB
      .join(broadcast(bucketOffsets), "__bucket")
      .withColumn("__before",
        col("__bucket_offset") + coalesce(sum(col(valueCol)).over(withinBucket), lit(0L)))
      .drop("__bucket", "__bucket_offset")
  }
}
