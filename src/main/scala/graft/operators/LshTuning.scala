package graft.operators

/** Density-scaled tuning for the multi-table sign-LSH blockers
  * ([[Dedup.embeddingPairsLsh]], [[Similarity.knnJoinLsh]]).
  *
  * The 10× sweep's sharpest lesson (SCALE.md): FIXED LSH tuning does not
  * survive corpus growth — at 10× density the within-bucket candidate set
  * grows ~quadratically and a 26× wall-clock blow-up follows. The
  * response is standard LSH theory, not a constant:
  *
  *  - `planes` caps expected bucket occupancy: 2^planes buckets per
  *    table ⇒ planes = ⌈log2(n / targetBucket)⌉ keeps the per-bucket
  *    quadratic term at ~targetBucket² regardless of corpus size.
  *  - `tables` buys recall back: a pair at cosine `threshold` collides
  *    in one table with p = (1 − θ/π)^planes (θ = arccos(threshold)),
  *    so tables = ⌈ln(1 − recall) / ln(1 − p)⌉ reaches the target
  *    recall 1 − (1 − p)^tables.
  *
  * Consistency with the measured sweeps: at n = 2,000 / threshold 0.45
  * this yields (planes 3, tables 10) — the battery's hand tuning is
  * (3, 8); at n = 20,000 it yields (planes 6, tables ≤ 64 capped) —
  * ScaleTen's plane sweep measured (6, 32) as the recall-recovering
  * point. The model is deliberately conservative on tables (it assumes
  * the threshold-angle worst case; real near-dup pairs are closer), so
  * `maxTables` caps the candidate-side cost.
  */
object LshTuning {

  final case class Params(planes: Int, tables: Int)

  /** Tuning for a corpus of `n` vectors at cosine `threshold`.
    *
    * @param targetBucket expected bucket occupancy the planes cap
    *                     enforces (per-bucket candidate work ~ this²)
    * @param targetRecall per-pair collision probability floor at the
    *                     threshold angle (worst case over the accepted
    *                     similarity range)
    */
  def forCorpus(n: Long, threshold: Double,
                targetBucket: Int = 250,
                targetRecall: Double = 0.95,
                maxTables: Int = 64): Params = {
    require(n > 0, "corpus size must be positive")
    require(threshold > -1.0 && threshold < 1.0, "threshold in (-1, 1)")
    require(targetBucket > 0 && targetRecall > 0 && targetRecall < 1)
    val planes = math.max(1,
      math.ceil(math.log(n.toDouble / targetBucket) / math.log(2.0)).toInt)
    val theta = math.acos(threshold)
    val pCollide = math.pow(1.0 - theta / math.Pi, planes.toDouble)
    val tables =
      if (pCollide >= 1.0) 1
      else math.min(maxTables.toLong,
        math.max(1L, math.ceil(
          math.log1p(-targetRecall) / math.log1p(-pCollide)).toLong)).toInt
    Params(planes, tables)
  }
}
