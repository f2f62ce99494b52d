package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
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

  /** The deterministic (source, hash-order) base table every allocator
    * shares: (__id, __src, n_tokens, __h, __alloc, __bucket), zero-weight
    * sources already dropped.
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
    df.select(col(idCol).as("__id"), col(sourceCol).as("__src"),
        TextFunctions.tokenCount(col(textCol)).as("n_tokens"),
        md5(col(textCol)).as("__h"))
      .withColumn("__alloc", allocExpr)
      .filter(col("__alloc") > 0)
      .withColumn("__bucket", conv(substring(col("__h"), 1, 4), 16, 10).cast("long"))
  }

  /** Adds `__before` = per-source running token total over the
    * deterministic (__h, __id) order — the two-level distributed prefix
    * sum described above.
    */
  private def withRunningTotal(base: DataFrame): DataFrame = {
    val bucketSums = base.groupBy("__src", "__bucket")
      .agg(sum(col("n_tokens")).as("__bsum"))
    val bucketOffsets = bucketSums
      .withColumn("__boff",
        coalesce(sum(col("__bsum")).over(Window.partitionBy("__src")
          .orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__src", "__bucket", "__boff")
    val within = Window.partitionBy("__src", "__bucket")
      .orderBy("__h", "__id").rowsBetween(Window.unboundedPreceding, -1)
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
