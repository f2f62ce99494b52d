package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DATA MIXING: deterministic selection of documents to hit a target
  * per-source token distribution — the "mixture weights" stage that turns
  * a curated corpus into a training mix (x% web, y% books, …).
  *
  * Each source gets `floor(totalBudget × weight)` tokens; documents are
  * taken in the deterministic hash order `(md5(text), id)` (reproducible
  * across engines, partitionings, and runs — same contract as
  * [[Sampling]]) until the next document would exceed the source's
  * allocation. Sources with no/zero weight drop before any shuffle.
  *
  * Scale: the per-source running token total is the two-level distributed
  * prefix sum ([[Chunking.packByTokenBudget]]'s pattern, per group): the
  * leading hex chars of the hash bucket each source's order (lexicographic
  * hex order == numeric prefix order), bucket sums aggregate with map-side
  * combine, offsets come from a window over the tiny (source, bucket)
  * table, and the within-bucket window is bounded by bucket width — no
  * single task ever sorts a whole source, so a 90%-web corpus cannot pin
  * one partition.
  */
object Mixing {

  /** Block width for the two-level epoch explode in [[allocateWithEpochs]]
    * — bounds every generated array to max(epochs/4096, 4096) elements.
    */
  private val EpochBlock = 4096L

  /** The deterministic hash-order document table every allocator shares:
    * (__id, __src, n_tokens, __h, __bucket).
    */
  private def hashBase(df: DataFrame, idCol: String, textCol: String,
                       sourceCol: String): DataFrame =
    df.select(col(idCol).as("__id"), col(sourceCol).as("__src"),
        TextFunctions.tokenCount(col(textCol)).as("n_tokens"),
        md5(col(textCol)).as("__h"))
      .withColumn("__bucket", conv(substring(col("__h"), 1, 4), 16, 10).cast("long"))

  /** [[hashBase]] plus `__alloc` from a caller-fixed weight map,
    * zero-weight sources already dropped.
    */
  private def allocBase(df: DataFrame, idCol: String, textCol: String,
                        sourceCol: String, weights: Map[String, Double],
                        totalBudget: Long): DataFrame = {
    require(totalBudget > 0, "totalBudget must be positive")
    require(weights.values.forall(_ >= 0), "weights must be non-negative")
    val allocExpr = weights.foldLeft(lit(0L)) { case (acc, (src, w)) =>
      when(col("__src") === src, lit(math.floor(totalBudget * w).toLong))
        .otherwise(acc)
    }
    hashBase(df, idCol, textCol, sourceCol)
      .withColumn("__alloc", allocExpr)
      .filter(col("__alloc") > 0)
  }

  /** Adds `__before` = per-source running token total over the
    * deterministic per-source order (`orderCols`; `__bucket` must be a
    * monotone coarsening of it within each source) — the two-level
    * distributed prefix sum described above.
    */
  private def withRunningTotal(base: DataFrame,
      orderCols: Seq[Column] = Seq(col("__h"), col("__id"))): DataFrame = {
    val bucketSums = base.groupBy("__src", "__bucket")
      .agg(sum(col("n_tokens")).as("__bsum"))
    val bucketOffsets = bucketSums
      .withColumn("__boff",
        coalesce(sum(col("__bsum")).over(Window.partitionBy("__src")
          .orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__src", "__bucket", "__boff")
    val within = Window.partitionBy("__src", "__bucket")
      .orderBy(orderCols: _*).rowsBetween(Window.unboundedPreceding, -1)
    base
      .join(broadcast(bucketOffsets), Seq("__src", "__bucket"))
      .withColumn("__before",
        col("__boff") + coalesce(sum(col("n_tokens")).over(within), lit(0L)))
  }

  def allocateByTokenBudget(df: DataFrame, idCol: String, textCol: String,
                            sourceCol: String, weights: Map[String, Double],
                            totalBudget: Long): DataFrame =
    withRunningTotal(allocBase(df, idCol, textCol, sourceCol, weights, totalBudget))
      // never-exceed contract: a document is taken only if it fits the
      // remaining allocation entirely (a giant first document can yield an
      // empty source rather than a blown budget)
      .filter(col("__before") + col("n_tokens") <= col("__alloc"))
      .select(col("__id").as(idCol), col("__src").as(sourceCol), col("n_tokens"))

  /** TEMPERATURE-BALANCED mixture: mixture weights DERIVED from the corpus
    * itself as `w_s ∝ c_s^α` (c_s = source s's token count) — the standard
    * multilingual/multi-domain rebalancing knob (α = 1 keeps natural
    * proportions, α → 0 approaches uniform, α = 0.5 is the common
    * compromise). No caller-supplied weight map: the per-source totals are
    * one map-side-combined aggregate over the corpus.
    *
    * Cross-engine exactness: the only float step is `c^α` itself, which is
    * immediately quantized to the integer `q_s = floor(c_s^α · 2²⁰)`; the
    * allocation `floor(B · q_s / Σq)` is then pure integer arithmetic
    * (decimal(38,0) product, integral division) — no float SUM whose
    * accumulation order could differ between engines. α = 0.5 / 1.0 / 0.0
    * use sqrt / identity / indicator, all correctly rounded by IEEE-754,
    * so those temperatures are bit-deterministic everywhere; other α rely
    * on libm `pow` agreement (a 1-ulp divergence flips `q_s` only when
    * `c^α·2²⁰` lands within an ulp of an integer, p ≈ 2⁻³³ per source).
    *
    * Selection within each source is the same deterministic hash order and
    * never-exceed contract as [[allocateByTokenBudget]] (shared prefix-sum
    * machinery). Output: one row per taken document
    * (idCol, sourceCol, n_tokens).
    */
  def allocateByTemperature(df: DataFrame, idCol: String, textCol: String,
                            sourceCol: String, alpha: Double,
                            totalBudget: Long): DataFrame = {
    require(totalBudget > 0, "totalBudget must be positive")
    require(alpha >= 0.0 && alpha <= 1.0, "alpha must be in [0, 1]")
    val base = hashBase(df, idCol, textCol, sourceCol)
    val alloc = temperatureAlloc(base, alpha, totalBudget)
    withRunningTotal(base.join(broadcast(alloc), "__src"))
      .filter(col("__before") + col("n_tokens") <= col("__alloc"))
      .select(col("__id").as(idCol), col("__src").as(sourceCol), col("n_tokens"))
  }

  /** The temperature weight → integer allocation table (`__src`,
    * `__alloc`) shared by [[allocateByTemperature]] and
    * [[allocateByTemperatureBestFirst]] — see the exactness discussion
    * above.
    */
  private def temperatureAlloc(base: DataFrame, alpha: Double,
                               totalBudget: Long): DataFrame = {
    val cD = col("__c").cast("double")
    val pw =
      if (alpha == 1.0) cD
      else if (alpha == 0.5) sqrt(cD)
      else if (alpha == 0.0) when(cD > 0, lit(1.0)).otherwise(lit(0.0))
      else pow(cD, lit(alpha))
    val q = base.groupBy("__src").agg(sum(col("n_tokens")).as("__c"))
      .withColumn("__q", floor(pw * (1L << 20)).cast("long"))
      .filter(col("__q") > 0)
    // Σq is an INTEGER sum (order-independent); the per-source allocation
    // is an exact integral division of the decimal product, so every
    // engine floors the same rational number. The constant-key window
    // runs over the |sources|-row aggregate table, never over data rows
    // (lit(0) keeps the single-partition plan but silences the
    // no-partition WARN so real warnings stay visible).
    // (NOT named __Q: SQL resolution is case-insensitive, so an expr
    // referencing __Q silently binds to __q.)
    q.withColumn("__qsum", sum(col("__q")).over(Window.partitionBy(lit(0))))
      .withColumn("__alloc",
        expr(s"(CAST(__q AS DECIMAL(38,0)) * CAST($totalBudget AS DECIMAL(38,0))) div __qsum"))
      .filter(col("__alloc") > 0)
      .select("__src", "__alloc")
  }

  /** [[allocateByTemperature]] filled BEST-FIRST instead of
    * hash-uniformly: within each source the per-source token allocation is
    * consumed in `score` descending order (ties → smallest id, NULL
    * scores last) — "temperature-weighted budgets, filled with each
    * source's best documents", the quality-aware capstone of a mixture
    * build (per-source [[graft.operators.Sampling.selectTopUnderTokenBudget]]
    * with the budgets derived from the corpus itself). Same never-exceed
    * contract and integer allocation arithmetic; the per-source running
    * total orders by the quantized score (`scoreBucketWidth` buckets the
    * coarse level — balance only, order inside a bucket is exact).
    * Output: (idCol, sourceCol, n_tokens), one row per taken document.
    */
  def allocateByTemperatureBestFirst(df: DataFrame, idCol: String,
                                     textCol: String, sourceCol: String,
                                     score: Column, alpha: Double,
                                     totalBudget: Long,
                                     scoreBucketWidth: Double = 1.0 / 1024): DataFrame = {
    require(totalBudget > 0, "totalBudget must be positive")
    require(alpha >= 0.0 && alpha <= 1.0, "alpha must be in [0, 1]")
    require(scoreBucketWidth > 0, "scoreBucketWidth must be positive")
    val base = df.select(col(idCol).as("__id"), col(sourceCol).as("__src"),
        TextFunctions.tokenCount(col(textCol)).as("n_tokens"),
        // NULL/NaN scores rank last; a NaN must not reach the bucket
        // floor's long cast (ANSI error)
        when(score.isNull || isnan(score), lit(Double.MaxValue))
          .otherwise(-score).as("__negscore"))
      .withColumn("__bucket",
        when(col("__negscore") === lit(Double.MaxValue), lit(Long.MaxValue))
          .otherwise(floor(col("__negscore") / scoreBucketWidth).cast("long")))
    val alloc = temperatureAlloc(base, alpha, totalBudget)
    withRunningTotal(base.join(broadcast(alloc), "__src"),
        Seq(col("__negscore"), col("__id")))
      .filter(col("__before") + col("n_tokens") <= col("__alloc"))
      .select(col("__id").as(idCol), col("__src").as(sourceCol), col("n_tokens"))
  }

  /** WEIGHT-TABLE mixture: [[allocateByTokenBudget]] with the weights as
    * a DATAFRAME of integer-quantized rows `(sourceCol, weight_q)`
    * instead of a driver-side map — the COMPOSITION form: per-source
    * weights computed by another operator (mean quality score, PageRank
    * of the source's host, label propensity) flow straight in without a
    * driver collect. Sources absent from the table (or with
    * non-positive weight) drop entirely.
    *
    * The caller provides weights ALREADY quantized to integers (Q16/Q20
    * — their choice, only ratios matter): quantization is where
    * float-determinism policy lives, and it belongs to the producer of
    * the weights (the [[allocateByTemperature]] discipline). From there
    * everything is exact: Σw is an integer sum, each allocation is
    * `floor(B·w / Σw)` via a decimal(38,0) product and integral
    * division, and document selection is the shared deterministic
    * hash-order prefix-sum. The weight table is |sources|-row and
    * broadcasts; the one window runs over that aggregate table, never
    * data rows.
    */
  def allocateByWeightTable(df: DataFrame, idCol: String, textCol: String,
                            sourceCol: String, weights: DataFrame,
                            weightCol: String,
                            totalBudget: Long): DataFrame = {
    require(totalBudget > 0, "totalBudget must be positive")
    val base = hashBase(df, idCol, textCol, sourceCol)
    val q = weights.select(col(sourceCol).as("__src"),
        col(weightCol).cast("long").as("__q"))
      .filter(col("__q") > 0)
    val alloc = q
      .withColumn("__qsum", sum(col("__q")).over(Window.partitionBy(lit(0))))
      .withColumn("__alloc",
        expr(s"(CAST(__q AS DECIMAL(38,0)) * CAST($totalBudget AS DECIMAL(38,0))) div __qsum"))
      .filter(col("__alloc") > 0)
      .select("__src", "__alloc")
    withRunningTotal(base.join(broadcast(alloc), "__src"))
      .filter(col("__before") + col("n_tokens") <= col("__alloc"))
      .select(col("__id").as(idCol), col("__src").as(sourceCol), col("n_tokens"))
  }

  /** UPSAMPLING mixture: [[allocateByTokenBudget]] for the case every real
    * mixture hits — a high-weight source SMALLER than its allocation (the
    * Wikipedia-at-5-epochs shape). Each source repeats in full
    * `floor(alloc / sourceTokens)` times (`epoch` 0..e-1), and the
    * remaining `alloc − e·sourceTokens` tokens fill one last partial pass
    * (epoch `e`) in the same deterministic hash order and never-exceed
    * contract as the plain allocator. Output one row per (document, epoch)
    * — the downstream shuffler/packer sees repetition explicitly instead
    * of a hidden multiplier.
    *
    * Scale: the per-source totals table is one map-side-combined aggregate
    * (|sources| rows, broadcast back); full epochs are a narrow TWO-LEVEL
    * explode (blocks of [[EpochBlock]] epochs, then offsets within the
    * block) — no shuffle grows with the epoch count, and no task ever
    * materializes an array longer than `max(epochs/EpochBlock,
    * EpochBlock)` elements, so a tiny source paired with a huge budget
    * (millions of epochs) costs O(output rows), not an epochs-length
    * array per document row. The partial pass reuses the two-level prefix
    * sum. A source large enough to need no repetition degenerates to
    * exactly the plain allocator's rows with epoch 0.
    */
  def allocateWithEpochs(df: DataFrame, idCol: String, textCol: String,
                         sourceCol: String, weights: Map[String, Double],
                         totalBudget: Long): DataFrame = {
    val base = allocBase(df, idCol, textCol, sourceCol, weights, totalBudget)
    val perSource = base.groupBy("__src")
      .agg(sum(col("n_tokens")).as("__T"), max(col("__alloc")).as("__a"))
      .withColumn("__epochs",
        when(col("__T") > 0, expr("__a div __T")).otherwise(lit(0L)))
      .withColumn("__rem", col("__a") - col("__epochs") * col("__T"))
      .select("__src", "__epochs", "__rem")
    val joined = base.join(broadcast(perSource), "__src")
    // epoch 0..e-1 via two bounded explodes: per-row array length is
    // ceil(e / EpochBlock) for the block index and ≤ EpochBlock for the
    // offsets — never e itself (a single explode(sequence(0, e-1)) would
    // allocate an e-element array per document row and OOM a task once
    // budgets push epochs into the millions)
    val fullEpochs = joined.filter(col("__epochs") >= 1)
      .withColumn("__blk",
        explode(sequence(lit(0L), expr(s"(__epochs - 1) div $EpochBlock"))))
      .select(col("__id"), col("__src"), col("n_tokens"),
        explode(sequence(col("__blk") * EpochBlock,
          least(col("__epochs") - 1, (col("__blk") + 1) * EpochBlock - 1)))
          .as("epoch"))
    val partial = withRunningTotal(joined)
      .filter(col("__before") + col("n_tokens") <= col("__rem"))
      .select(col("__id"), col("__src"), col("n_tokens"),
        col("__epochs").as("epoch"))
    fullEpochs.unionByName(partial)
      .select(col("__id").as(idCol), col("__src").as(sourceCol),
        col("n_tokens"), col("epoch"))
  }
}
