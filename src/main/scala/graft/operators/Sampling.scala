package graft.operators

import graft.functions.TopN
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sampling operators for training-data pipelines.
  *
  * Both samplers are DETERMINISTIC: rows are ranked by a caller-supplied
  * order key (conventionally a cryptographic hash of stable columns, e.g.
  * `md5(text)` — uniform, reproducible across runs and engines, and
  * independent of partitioning). `df.sample()` by contrast is neither exact
  * in size nor stable under repartitioning — useless for reproducible
  * dataset curation.
  */
object Sampling {

  /** The shared hash-uniform contract every deterministic sampler keys on:
    * `first-8-hex-chars(md5(key))` as a long in [0, 2³²). ONE definition
    * on purpose — assignSplit/weightedSample/negativePairs docstrings all
    * pin reproducibility to this exact expression, so a drift in one copy
    * would silently break cross-operator agreement. Computed by the
    * native [[graft.functions.Md5Bucket]] expression — bit-identical to
    * `conv(substring(md5(key), 1, 8), 16, 10)` (spec-pinned), minus that
    * chain's per-row digest allocation, hex encode, and string parse.
    */
  private[operators] def hashLong(key: Column): Column =
    graft.functions.Md5Bucket.long(key.cast("string"))

  /** [[hashLong]] scaled to a uniform double in [0, 1). */
  private[operators] def hashUniform(key: Column): Column =
    hashLong(key).cast("double") / 4294967296.0

  /** [[hashUniform]] with u = 0 floored to 2⁻³² — the A-ES draw: ln(u)
    * must stay finite, so the (p ≈ 2⁻³² per key) all-zero md5 prefix maps
    * to the worst-possible finite key instead of NULL here / an ln(0)
    * error in a SQL oracle. Only the ORDER of draws matters, and the
    * floor preserves it (u = 0 was already the guaranteed-last draw).
    */
  private[operators] def aesUniform(key: Column): Column =
    greatest(hashLong(key), lit(1L)).cast("double") / 4294967296.0

  /** Exact-N per stratum: the `n` rows with the smallest `orderBy` key in
    * each distinct combination of `strataCols`.
    *
    * Plans as ONE ObjectHashAggregate over [[graft.functions.TopNRows]]:
    * each map task reduces its share of a stratum to ≤ n rows before the
    * shuffle, so a hot stratum ships n·partitions rows instead of its full
    * population — unlike the `row_number() OVER (PARTITION BY strata)`
    * formulation, which sorts whole strata in single tasks and dies on
    * skewed strata at scale.
    */
  def stratifiedExactN(df: DataFrame, strataCols: Seq[String], n: Int,
                       orderBy: Seq[Column]): DataFrame = {
    require(strataCols.nonEmpty, "strataCols must be non-empty")
    val rowStruct = struct(df.columns.map(col): _*)
    df.groupBy(strataCols.map(col): _*)
      .agg(TopN.rows(rowStruct, struct(orderBy: _*), n, isMax = false).as("__rows"))
      .select(explode(col("__rows")).as("__row"))
      .select("__row.*")
  }

  /** Exact-N uniform sample of the whole table: the `n` rows with the
    * smallest `orderBy` key. Plans as TakeOrderedAndProject — each partition
    * keeps its local top-n, the driver merges n·partitions rows; no shuffle
    * of the data.
    */
  def uniformExactN(df: DataFrame, n: Int, orderBy: Seq[Column]): DataFrame =
    df.orderBy(orderBy: _*).limit(n)

  /** DETERMINISTIC weighted sample WITHOUT replacement: the `n` rows with
    * the largest A-ES key (Efraimidis & Spirakis 2006: key = u^(1/w),
    * compared as ln(u)/w — same order, better numerics), where `u` is the
    * hash-uniform `first-8-hex(md5(key)) / 2³²` (the [[assignSplit]]
    * contract: reproducible across runs, engines, and partitionings, no
    * RNG state). Inclusion probability is proportional-to-weight at each
    * of the n draws — the standard one-pass weighted reservoir semantics.
    *
    * Rows with non-positive weight are excluded (a zero weight must never
    * be sampled; ln(u)/0 is undefined). Plans as TakeOrderedAndProject:
    * each partition keeps a local top-n heap, the driver merges
    * n·partitions candidates — no shuffle of the data, same as
    * [[uniformExactN]]. The ln(u)/w sort key is NOT emitted: its last-ulp
    * bits are libm-dependent, and ranking only needs its order.
    */
  def weightedSample(df: DataFrame, n: Int, weight: Column, key: Column): DataFrame = {
    val aesKey = log(aesUniform(key)) / weight.cast("double")
    // NULL keys/weights are EXCLUDED, not ranked: a null hash has no
    // defined draw, and engines disagree on where NULL sorts (desc
    // NULLS LAST here vs nulls-first in an aggregate buffer ordering) —
    // dropping is the only cross-path-consistent semantics
    df.filter(weight > 0 && key.isNotNull).orderBy(aesKey.desc, key).limit(n)
  }

  /** PER-STRATUM [[weightedSample]]: the `n` largest A-ES keys within
    * each distinct `strataCols` combination — weighted sampling that
    * respects group quotas (n per language/source, proportional to
    * weight within the group). Completes the sampler matrix:
    * uniform/weighted × global/stratified.
    *
    * Same bounded-heap plan as [[stratifiedExactN]] (one
    * ObjectHashAggregate over [[graft.functions.TopN]], map-side
    * combine), so a hot stratum ships n·partitions candidate rows, never
    * its population; the A-ES key is order-only here too.
    */
  def stratifiedWeightedSample(df: DataFrame, strataCols: Seq[String], n: Int,
                               weight: Column, key: Column): DataFrame = {
    require(strataCols.nonEmpty, "strataCols must be non-empty")
    val u = aesUniform(key)
    // TopN ranks ASCENDING on the struct; negate the key to take the
    // A-ES maxima, tiebreak on the caller's key. NULL keys/weights drop
    // (same contract as weightedSample: TopN's interpreted struct
    // ordering is nulls-FIRST, which would rank an undefined draw BEST)
    val positive = df.filter(weight > 0 && key.isNotNull)
    val rowStruct = struct(positive.columns.map(col): _*)
    positive.groupBy(strataCols.map(col): _*)
      .agg(TopN.rows(rowStruct,
        struct((-(log(u) / weight.cast("double"))).as("neg_aes"), key),
        n, isMax = false).as("__rows"))
      .select(explode(col("__rows")).as("__row"))
      .select("__row.*")
  }

  /** DETERMINISTIC random NEGATIVE PAIRS for contrastive training: each
    * anchor gets `k` pseudo-random corpus rows ("negatives") WITHOUT a
    * cross join — the naive anchors × corpus enumeration is the classic
    * scale-killer of embedding-model data prep.
    *
    * Mechanism: corpus rows land in `nBuckets` hash buckets once; each
    * (anchor, slot i < k) probes bucket `h(anchor:i) mod nBuckets` and
    * takes the candidate minimizing `md5(anchor:i:candidate)` — all
    * md5-derived (the [[assignSplit]] contract), so the selection is
    * reproducible across runs, engines, and partitionings. One equi-join
    * on the bucket key + one bounded argmin aggregate; join volume is
    * `anchors × k × corpus/nBuckets` — size `nBuckets` so buckets hold
    * O(100) rows and the probe costs anchors×k×100, not anchors×corpus.
    *
    * Semantics callers must know: slots sample with replacement (two
    * slots of one anchor can draw the same negative — dedupe downstream
    * if undesired); an empty bucket yields no row for its slot (buckets
    * are ~corpus/nBuckets rows, so only a tiny corpus can starve one);
    * self-pairs are excluded when anchor and candidate ids collide.
    * Output: (anchor, slot, negative).
    */
  def negativePairs(anchors: DataFrame, anchorIdCol: String,
                    corpus: DataFrame, corpusIdCol: String,
                    k: Int, nBuckets: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(nBuckets >= 1, "nBuckets must be >= 1")
    def h8(c: Column): Column = hashLong(c)
    val cand = corpus.select(col(corpusIdCol).as("__cand"),
      (h8(col(corpusIdCol)) % nBuckets).as("__b"))
    val slots = anchors.select(col(anchorIdCol).as("anchor"))
      .withColumn("slot", explode(sequence(lit(0L), lit(k - 1L))))
      .withColumn("__b", h8(concat(col("anchor").cast("string"), lit(":"),
        col("slot").cast("string"))) % nBuckets)
    slots.join(cand, "__b")
      .filter(col("__cand") =!= col("anchor"))
      .withColumn("__h", md5(concat(col("anchor").cast("string"), lit(":"),
        col("slot").cast("string"), lit(":"), col("__cand").cast("string"))))
      .groupBy("anchor", "slot")
      .agg(min(struct(col("__h"), col("__cand"))).as("__m"))
      .select(col("anchor"), col("slot"), col("__m.__cand").as("negative"))
  }

  /** DETERMINISTIC train/val/test (or arbitrary) split assignment, keyed
    * on any column: rows with the same `key` ALWAYS land in the same
    * split, across runs, engines, partitionings, and growing data —
    * `randomSplit` guarantees none of that. Pass a GROUP key (near-dup
    * cluster id, source domain) instead of the row id and the split is
    * leakage-aware: a whole cluster moves together, so no near-duplicate
    * of a training document can sit in the eval split.
    *
    * The split point is `u = first-8-hex-chars(md5(key)) / 2³²` compared
    * against the cumulative fraction boundaries — pure per-row arithmetic,
    * no shuffle, no state. Boundaries accumulate in IEEE doubles; prefer
    * binary-exact fractions (0.75/0.125/0.125) when a second system must
    * reproduce the boundary values bit-for-bit. A NULL key hashes to NULL
    * and lands in the LAST split (every `when` comparison is null-false).
    */
  def assignSplit(df: DataFrame, key: Column,
                  fractions: Seq[(String, Double)],
                  splitCol: String = "split"): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0),
      "fractions must be positive")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "fractions must sum to 1")
    val u = hashUniform(key)
    val boundaries = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val assigned = fractions.init.zip(boundaries.init)
      .foldRight(lit(fractions.last._1): Column) { case (((name, _), b), acc) =>
        when(u < b, name).otherwise(acc)
      }
    df.withColumn(splitCol, assigned)
  }

  /** DETERMINISTIC per-stratum Bernoulli sampling — `sampleBy` without
    * the randomness: a row survives iff
    * `hash32(key) < floor(fraction(stratum) · 2³²)`, so the SAME rows
    * survive on every run, every engine, every partitioning — which is
    * what makes downstream caches, A/B slices, and incremental re-runs
    * of a pipeline reproducible (the [[assignSplit]] coin, reused as an
    * inclusion test). Strata absent from `fractions` drop entirely;
    * fraction 1.0 keeps the whole stratum; the integer threshold is
    * computed ONCE driver-side so the comparison is a pure long compare
    * (no per-row float multiply to disagree about).
    *
    * One narrow filter — no shuffle, no state, pushes down past column
    * pruning like any predicate. The sample FRACTION is exact only in
    * expectation (each key is one Bernoulli draw); for exact-N-per-
    * stratum use [[stratifiedExactN]].
    */
  def sampleByFraction(df: DataFrame, key: Column, strataCol: String,
                       fractions: Map[String, Double]): DataFrame = {
    require(fractions.nonEmpty, "fractions must be non-empty")
    require(fractions.values.forall(f => f >= 0 && f <= 1),
      "fractions must be in [0, 1]")
    val thresholds = fractions.map { case (s, f) =>
      s -> math.floor(f * 4294967296.0).toLong
    }
    val thresholdExpr = thresholds.foldLeft(lit(-1L)) { case (acc, (s, t)) =>
      when(col(strataCol) === s, lit(t)).otherwise(acc)
    }
    df.filter(hashLong(key) < thresholdExpr)
  }

  /** NEAR-DUP SPLIT LEAKAGE report: the near-duplicate pairs whose
    * endpoints landed in DIFFERENT splits — each one an eval example with
    * a near-copy in training data, the contamination a random per-document
    * split silently creates. `assigned` is the split-labeled corpus
    * ([[assignSplit]]'s output shape), `pairs` a near-dup pair table
    * (id1, id2) from any of the dedup families. Output: (id1, id2,
    * split1, split2), split1 ≠ split2. Two id-keyed joins — the report
    * costs the pair table, never a corpus re-scan. An empty result is the
    * acceptance check for [[assignSplitByCluster]].
    */
  def splitLeakage(assigned: DataFrame, idCol: String, splitCol: String,
                   pairs: DataFrame): DataFrame = {
    val a1 = assigned.select(col(idCol).as("__i1"), col(splitCol).as("split1"))
    val a2 = assigned.select(col(idCol).as("__i2"), col(splitCol).as("split2"))
    pairs.join(a1, pairs("id1") === col("__i1"))
      .join(a2, pairs("id2") === col("__i2"))
      .filter(col("split1") =!= col("split2"))
      .drop("__i1", "__i2")
  }

  /** LEAKAGE-FREE split assignment: [[assignSplit]] keyed on the near-dup
    * CLUSTER representative instead of the document id — every connected
    * component of the pair graph ([[Dedup.connectedComponents]], isolated
    * docs are their own component) lands in ONE split, so no eval example
    * has a near-copy in training by construction
    * ([[splitLeakage]] of the result is empty, spec-pinned). Fractions
    * then hold in expectation over CLUSTERS, not documents — a corpus
    * whose near-dup mass is very skewed will see proportionally skewed
    * split sizes, the price of the guarantee. Output: input columns +
    * `component` + `splitCol`.
    */
  def assignSplitByCluster(df: DataFrame, idCol: String, pairs: DataFrame,
                           fractions: Seq[(String, Double)],
                           splitCol: String = "split",
                           maxIter: Int = 25): DataFrame = {
    val comp = Dedup.connectedComponents(df, idCol, pairs, maxIter)
      .withColumnRenamed("id", "__cid")
    val withComp = df.join(comp, df(idCol) === col("__cid")).drop("__cid")
    assignSplit(withComp, col("component"), fractions, splitCol)
  }

  /** Budget-bounded quality selection: rank documents by `score`
    * descending (ties → smallest `idCol`; NULL scores rank LAST) and keep
    * the maximal prefix whose cumulative token count fits `budgetTokens` —
    * the "take the best data until the token budget is spent" step of a
    * data-selection pipeline (the DSIR / quality-classifier consumption
    * pattern). PREFIX semantics: the first document that would overflow
    * the budget is dropped and so is everything ranked below it, even a
    * later smaller document — selection is a rank cutoff, not a knapsack
    * repack (a repack is inherently sequential and would make the chosen
    * set depend on sizes of REJECTED better-ranked documents).
    *
    * Output = input columns + `n_tokens` + `cum_tokens` (inclusive
    * running total; `cum_tokens ≤ budgetTokens` for every surviving row).
    *
    * The global running total is the two-level distributed prefix sum of
    * [[Chunking.packByTokenBudget]] (coarse score buckets aggregate, the
    * tiny bucket-sum table windows, offsets broadcast back) — no single
    * task ever sorts the corpus. `scoreBucketWidth` quantizes the score
    * into those coarse buckets; it affects only bucket BALANCE (ties and
    * sub-width clusters still order exactly, by score then id, inside the
    * within-bucket window), so tune it to the score's spread — the
    * default suits scores in [0, 1].
    *
    * `tokenCounter` maps the text column to its BIGINT token count — pass
    * `TextFunctions.bpeTokenCount(_, vocab)` to denominate the budget in
    * real merged subwords.
    */
  def selectTopUnderTokenBudget(df: DataFrame, idCol: String, textCol: String,
      score: Column, budgetTokens: Long,
      scoreBucketWidth: Double = 1.0 / 1024,
      tokenCounter: Column => Column =
        graft.functions.TextFunctions.tokenCount): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(scoreBucketWidth > 0, "scoreBucketWidth must be positive")
    val withCols = df
      .withColumn("n_tokens", tokenCounter(col(textCol)))
      // negated score: ascending order = best-first; NULL/NaN → +MaxValue
      // (ranks after every finite score, monotone with its bucket below —
      // and a NaN must not reach the bucket floor's long cast, which
      // errors under ANSI)
      .withColumn("__negscore",
        when(score.isNull || isnan(score), lit(Double.MaxValue))
          .otherwise(-score))
    val bucket = when(col("__negscore") === lit(Double.MaxValue), lit(Long.MaxValue))
      .otherwise(floor(col("__negscore") / scoreBucketWidth).cast("long"))
    Chunking.withRunningTotal(withCols, bucket,
        Seq(col("__negscore"), col(idCol)), "n_tokens")
      .filter(col("__before") + col("n_tokens") <= budgetTokens)
      .withColumn("cum_tokens", col("__before") + col("n_tokens"))
      .drop("__before", "__negscore")
  }
}
