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

  def allocateByTokenBudget(df: DataFrame, idCol: String, textCol: String,
                            sourceCol: String, weights: Map[String, Double],
                            totalBudget: Long): DataFrame = {
    require(totalBudget > 0, "totalBudget must be positive")
    require(weights.values.forall(_ >= 0), "weights must be non-negative")
    val allocExpr = weights.foldLeft(lit(0L)) { case (acc, (src, w)) =>
      when(col("__src") === src, lit(math.floor(totalBudget * w).toLong))
        .otherwise(acc)
    }
    val base = df.select(col(idCol).as("__id"), col(sourceCol).as("__src"),
        TextFunctions.tokenCount(col(textCol)).as("n_tokens"),
        md5(col(textCol)).as("__h"))
      .withColumn("__alloc", allocExpr)
      .filter(col("__alloc") > 0)
      .withColumn("__bucket", conv(substring(col("__h"), 1, 4), 16, 10).cast("long"))
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
      // never-exceed contract: a document is taken only if it fits the
      // remaining allocation entirely (a giant first document can yield an
      // empty source rather than a blown budget)
      .filter(col("__before") + col("n_tokens") <= col("__alloc"))
      .select(col("__id").as(idCol), col("__src").as(sourceCol), col("n_tokens"))
  }
}
