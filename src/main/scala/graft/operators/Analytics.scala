package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** OLAP analytics operators over event/fact tables: pivot, rollup/cube,
  * cohort retention, and exact statistical outlier flagging — the
  * reporting tier a data-curation pipeline feeds.
  */
object Analytics {

  /** PIVOT: one count column per `pivotValues` entry, zero-filled.
    *
    * `pivotValues` is REQUIRED, not discovered: Spark's value-less
    * `pivot(col)` runs a separate driver-side distinct job over the pivot
    * column before it can even plan — at 100 TB that is a full extra scan,
    * and an unbounded column cardinality would explode the schema. With
    * explicit values the whole pivot compiles to ONE hash aggregate whose
    * buffer holds |values| conditional counts per row key — a single
    * shuffle of |rowKeys| × |values| cells, map-side combined.
    *
    * Absent (rowKey, value) combinations surface as 0, not NULL (Spark's
    * raw pivot-count leaves them NULL; a count of nothing is zero).
    */
  def pivotCounts(df: DataFrame, rowCols: Seq[String], pivotCol: String,
                  pivotValues: Seq[String]): DataFrame = {
    require(rowCols.nonEmpty, "rowCols must be non-empty")
    require(pivotValues.nonEmpty, "pivotValues must be explicit (a value-less" +
      " pivot adds a driver-side distinct-discovery job over the full table)")
    require(pivotValues.forall(!_.contains("`")),
      "pivot values must not contain backticks (column-name quoting)")
    val pivoted = df.groupBy(rowCols.map(col): _*)
      .pivot(pivotCol, pivotValues)
      .agg(count(lit(1)))
    pivoted.select(rowCols.map(col) ++
      pivotValues.map(v => coalesce(col(s"`$v`"), lit(0L)).as(v)): _*)
  }

  /** ROLLUP aggregation with the grouping-id convention: one row per
    * prefix level of `keys` (full detail → grand total), `gid` = Spark's
    * `grouping_id()` as INT so consumers can tell a rolled-up NULL from a
    * data NULL without guessing.
    *
    * Scale: Spark plans rollup as Expand (|keys|+1 copies of each input
    * row) + one hash aggregate — but partial aggregation runs AFTER the
    * expand on the map side, so the shuffle carries ≈ groups × levels
    * rows, not rows × levels. The level count is the one multiplier to
    * watch: rollup is linear in |keys|, cube is 2^|keys| — prefer rollup
    * unless every margin is genuinely needed.
    */
  def rollupAgg(df: DataFrame, keys: Seq[String], aggs: Seq[Column]): DataFrame = {
    require(keys.nonEmpty && aggs.nonEmpty, "keys and aggs must be non-empty")
    df.rollup(keys.map(col): _*)
      .agg(aggs.head, aggs.tail :+ grouping_id().cast("int").as("gid"): _*)
  }

  /** CUBE twin of [[rollupAgg]] — every subset of `keys` (2^|keys| grouping
    * sets; see the scale note there).
    */
  def cubeAgg(df: DataFrame, keys: Seq[String], aggs: Seq[Column]): DataFrame = {
    require(keys.nonEmpty && aggs.nonEmpty, "keys and aggs must be non-empty")
    df.cube(keys.map(col): _*)
      .agg(aggs.head, aggs.tail :+ grouping_id().cast("int").as("gid"): _*)
  }

  /** COHORT RETENTION: users bucketed by the day of their FIRST event
    * (`cohort`), counted once per day-offset `k` at which they were active
    * again → (cohort DATE, k INT, n_users BIGINT). The k = 0 row is the
    * cohort's size; n_users at k > 0 over it is the classic retention
    * curve.
    *
    * Plan shape: one user-keyed aggregate for first-event timestamps
    * (map-side combined min), one user-keyed equi-join back (the cohort
    * table is |users| rows — AQE broadcasts it when it fits), a DISTINCT
    * on (user, cohort, k) so a user active 1000× on day k counts once
    * (map-side partial dedup bounds the shuffle at users × active-days),
    * then the final (cohort, k) count. No windows, no per-user sorts —
    * a user with millions of events collapses on the map side.
    */
  def retentionCohorts(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val firstEvent = events.groupBy(col(userCol).as("__u"))
      .agg(to_date(min(col(tsCol))).as("cohort"))
    events.select(col(userCol).as("__u"), to_date(col(tsCol)).as("__d"))
      .join(firstEvent, "__u")
      .select(col("__u"), col("cohort"),
        datediff(col("__d"), col("cohort")).as("k"))
      .distinct()
      .groupBy("cohort", "k")
      .agg(count(lit(1)).as("n_users"))
  }

  /** PER-ENTITY ordered time-series signals — the window-function family:
    * `mov_sum` (sum of `value` over the current + `frameRows − 1`
    * preceding rows) and `delta` (difference from the previous row; NULL
    * on each entity's first row). Integer inputs stay integer-exact —
    * sums and differences, never a float mean.
    *
    * This IS Spark's window operator, deliberately: ORDERED per-entity
    * computation is the one shape where a window beats aggregation
    * composition. Scale behavior: one hash partition per entity, a sort
    * WITHIN partitions only (no global sort), state bounded by the frame.
    * The hazard is entity skew — one user with 10⁸ events sorts in a
    * single task; mitigate upstream by time-bucketing the entity key
    * (e.g. (user, month)) when entities are unbounded, which this
    * operator supports by passing composite `entityCols`.
    */
  def timeSeriesStats(df: DataFrame, entityCols: Seq[String],
                      orderCols: Seq[String], value: Column,
                      frameRows: Int = 3): DataFrame = {
    require(entityCols.nonEmpty && orderCols.nonEmpty,
      "entityCols and orderCols must be non-empty")
    require(frameRows >= 1, "frameRows must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(entityCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    df.withColumn("mov_sum",
        sum(value).over(w.rowsBetween(-(frameRows - 1).toLong, 0)))
      .withColumn("delta", value - lag(value, 1).over(w))
  }

  /** ROBUST (Tukey-fence) per-group outlier flag: marks rows outside
    * `[Q1 − k·IQR, Q3 + k·IQR]` of their group — the boxplot rule, immune
    * to the outliers themselves inflating the spread the way
    * [[flagOutliers]]' σ is.
    *
    * Cross-engine exactness comes from DYADIC arithmetic: Q1/Q3 are
    * exact-interpolation quantiles at 0.25/0.75 (quarters of integer
    * inputs are exact dyadic rationals — the [[Profile.groupQuantiles]]
    * parity argument), and a dyadic `k` (0.25, 0.5, 1.5, …) keeps the
    * fences exactly representable, so Spark and any IEEE engine flag
    * identical rows. Exact quantiles shuffle the group's values to one
    * aggregate buffer (same hazard as every exact-percentile op —
    * documented in Profile); the stats table is |groups| rows, broadcast
    * back, and the fact side never shuffles.
    */
  def tukeyOutliers(df: DataFrame, groupCols: Seq[String], value: Column,
                    k: Double = 1.5): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(k >= 0, "fence multiplier k must be non-negative")
    val v = value.cast("double")
    val stats = df.groupBy(groupCols.map(col): _*)
      .agg(percentile(v, lit(0.25)).as("q1"), percentile(v, lit(0.75)).as("q3"))
    val iqr = col("q3") - col("q1")
    // null-SAFE join: groupBy treats NULL keys as a group, so a plain
    // equi-join back would silently DROP every null-keyed input row
    joinStatsBack(df, stats, groupCols)
      .withColumn("outlier",
        coalesce(
          (v < col("q1") - lit(k) * iqr || v > col("q3") + lit(k) * iqr)
            .cast("int"), lit(0)))
  }

  /** WINSORIZE: clip `value` into its group's exact
    * [p(pLo), p(pHi)] percentile band — the "tame the heavy tail without
    * dropping rows" normalization (outlier-robust aggregates, feature
    * clipping before training). NULL values stay NULL (they are not
    * clipped to the floor — [[flagOutliers]]' null discipline).
    *
    * Cross-engine exactness is the [[tukeyOutliers]] dyadic argument:
    * keep pLo/pHi dyadic (defaults 1/64 and 63/64 — the "p1.5/p98.5"
    * band) over integer-valued inputs and the exact-interpolation
    * percentile produces identical doubles on every IEEE engine. Exact
    * per-group percentiles buffer the group's values (the documented
    * [[Profile.groupQuantiles]] hazard); the stats table is |groups| rows
    * broadcast back, and the fact side never shuffles.
    */
  def winsorize(df: DataFrame, groupCols: Seq[String], value: Column,
                pLo: Double = 0.015625, pHi: Double = 0.984375): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(pLo >= 0 && pLo < pHi && pHi <= 1, "need 0 <= pLo < pHi <= 1")
    val v = value.cast("double")
    val stats = df.groupBy(groupCols.map(col): _*)
      .agg(percentile(v, lit(pLo)).as("__lo"), percentile(v, lit(pHi)).as("__hi"))
    joinStatsBack(df, stats, groupCols)
      .withColumn("winsorized",
        when(v.isNull, lit(null).cast("double"))
          .otherwise(least(greatest(v, col("__lo")), col("__hi"))))
      .drop("__lo", "__hi")
  }

  /** PER-GROUP STANDARDIZATION (z-score transform) — the score-emitting
    * sibling of [[flagOutliers]]: every row gets
    * `z = (x − μ) / σ_pop` of its group, as a DOUBLE that is
    * bit-identical on every IEEE engine despite being float. The trick
    * is the operation ORDER: all accumulation happens in exact integer
    * sums (n, Σx, Σx²), and the float tail is
    *
    *   z = (n·x − Σx) / sqrt(n·Σx² − Σx²₍sq₎)  ·  (exactly, in this order)
    *
    * — an integer numerator, one correctly-rounded `sqrt` of an integer
    * (IEEE-754 guarantees sqrt, unlike ln/exp), and ONE division. No
    * order-dependent float sum ever happens, so partitioning cannot
    * change a bit. Note the n·… clearing means this equals
    * (x−μ)/σ_pop algebraically: (n·x−S)/√(n·Σx²−S²) =
    * (x−S/n)/√((n·Σx²−S²)/n²).
    *
    * NULL values keep NULL z. Zero-variance groups (all values equal)
    * and groups with n < 2 emit z = 0 for every member (the "no signal"
    * convention — a 0/0 NaN would poison downstream sorts). Same
    * overflow bound as [[flagOutliers]].
    *
    * Plan shape: one map-side-combined (n, sum, sumsq) aggregate,
    * broadcast-joined back; the fact side never shuffles.
    */
  def standardize(df: DataFrame, groupCols: Seq[String],
                  value: Column): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val v = value.cast("long")
    val stats = df.groupBy(groupCols.map(col): _*)
      .agg(count(v).as("n"), sum(v).as("__sum"), sum(v * v).as("__sumsq"))
    val varClear = col("n") * col("__sumsq") - col("__sum") * col("__sum")
    joinStatsBack(df, stats, groupCols)
      .withColumn("z",
        when(v.isNull, lit(null).cast("double"))
          .when(col("n") < 2 || varClear === 0L, lit(0.0))
          .otherwise((col("n") * v - col("__sum")).cast("double") /
            sqrt(varClear.cast("double"))))
      .drop("__sum", "__sumsq")
  }

  /** ROBUST per-group scaling — the median/MAD twin of [[standardize]]:
    * `robust_z = (x − median) / MAD` where MAD is the median absolute
    * deviation. One genuine outlier corrupts a mean/stddev z-score for
    * its whole group (the outlier drags the very statistics meant to
    * expose it); median and MAD have a 50% breakdown point, which is why
    * monitoring and anomaly pipelines scale with them.
    *
    * Cross-engine exactness: both medians are EXACT interpolated
    * percentiles at the dyadic 0.5 over integer inputs (the
    * [[tukeyOutliers]] argument — halves of integers are exactly
    * representable; |x − median| is then a sum/abs of exact doubles,
    * and its median is again exact), so the one division produces
    * identical doubles everywhere. Zero-MAD groups (≥ half the group at
    * the median) emit 0 — the [[standardize]] degenerate convention;
    * NULLs stay NULL.
    *
    * Two exact-percentile aggregates (each buffers the group — the
    * documented hazard), two |groups|-row broadcast joins; the fact
    * side never shuffles.
    */
  def robustStandardize(df: DataFrame, groupCols: Seq[String],
                        value: Column): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val v = value.cast("double")
    val med = df.groupBy(groupCols.map(col): _*)
      .agg(percentile(v, lit(0.5)).as("__med"))
    val withMed = joinStatsBack(df, med, groupCols)
    val mad = withMed.groupBy(groupCols.map(col): _*)
      .agg(percentile(abs(v - col("__med")), lit(0.5)).as("__mad"))
    joinStatsBack(withMed, mad, groupCols)
      .withColumn("robust_z",
        when(v.isNull, lit(null).cast("double"))
          .when(col("__mad") === 0.0, lit(0.0))
          .otherwise((v - col("__med")) / col("__mad")))
      .drop("__med", "__mad")
  }

  /** PERCENTILE RANK (ECDF transform): each row gets its group-relative
    * standing `pct_ppm = #strictly-smaller · 10⁶ div (n−1)` — the SQL
    * `percent_rank` contract (ties share the min rank) in EXACT INTEGER
    * parts-per-million, so engines and partitionings agree bit-for-bit.
    * The rank-normalization every heavy-tailed feature gets before
    * training, and the quantile-bucket assigner (bucket = pct_ppm div
    * (10⁶/k)).
    *
    * NOT a `percent_rank() OVER (PARTITION BY g ORDER BY v)` — that
    * window sorts every DATA row of a group in one task. Here the
    * per-(group, value) counts aggregate first (map-side combined), the
    * running prefix runs over the DISTINCT-VALUE table (bounded by value
    * cardinality per group, typically orders of magnitude below row
    * counts), and rows join back by (group, value). Single-member groups
    * emit 0; NULL values keep NULL rank.
    *
    * `buckets = Some(k)` adds a `bucket` column
    * `min(pct_ppm·k div 10⁶, k−1)` — quantile bucketing that is
    * VALUE-deterministic: equal values always share a bucket on every
    * engine (SQL `NTILE` splits by row position, so ties straddle
    * bucket boundaries differently per row order — unusable as a
    * reproducible feature).
    */
  def percentileRank(df: DataFrame, groupCols: Seq[String],
                     value: Column, buckets: Option[Int] = None): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(buckets.forall(_ > 0), "buckets must be positive")
    val v = value.cast("long")
    val counts = df.select(groupCols.map(col) :+ v.as("__v"): _*)
      .filter(col("__v").isNotNull)
      .groupBy((groupCols :+ "__v").map(col): _*)
      .agg(count(lit(1)).as("__c"))
    val perGroup = Window.partitionBy(groupCols.map(col): _*)
    val ranked = counts
      .withColumn("__less", coalesce(
        sum(col("__c")).over(perGroup.orderBy(col("__v"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(perGroup))
      .drop("__c")
    val rankedR = groupCols.foldLeft(ranked)((d, c) =>
      d.withColumnRenamed(c, s"__g_$c"))
    val cond = groupCols.map(c => df(c) <=> rankedR(s"__g_$c"))
      .reduce(_ && _) && (v === rankedR("__v"))
    val out = df.join(rankedR, cond, "left")
      .withColumn("pct_ppm",
        when(v.isNull, lit(null).cast("long"))
          .when(col("__n") < 2, lit(0L))
          .otherwise(expr("__less * 1000000 div (__n - 1)")))
      .drop(groupCols.map(c => s"__g_$c") :+ "__v" :+ "__less" :+ "__n": _*)
    buckets match {
      case None => out
      case Some(k) => out.withColumn("bucket",
        when(col("pct_ppm").isNull, lit(null).cast("long"))
          .otherwise(least(expr(s"pct_ppm * $k div 1000000"), lit(k - 1L))))
    }
  }

  /** Join a per-group stats table back onto the fact side with NULL-SAFE
    * key equality — `groupBy` puts null keys in a group of their own, and
    * a plain equi-join would drop those rows on the way back.
    */
  private def joinStatsBack(df: DataFrame, stats: DataFrame,
                            groupCols: Seq[String]): DataFrame = {
    val statsR = groupCols.foldLeft(stats)((d, c) => d.withColumnRenamed(c, s"__g_$c"))
    val cond = groupCols.map(c => df(c) <=> statsR(s"__g_$c")).reduce(_ && _)
    df.join(statsR, cond).drop(groupCols.map(c => s"__g_$c"): _*)
  }

  /** EXACT per-group statistical outlier flag: marks rows where
    * `|x − mean| > (kNum/kDen) · stddev_pop` of the row's group — in PURE
    * INTEGER arithmetic, so two engines agree bit-for-bit (a
    * floating-point mean/stddev pipeline is partition-order dependent).
    *
    * The test |x − μ| > k·σ is squared and cleared of denominators:
    *
    *   kDen² · (n·x − sum)²  >  kNum² · (n·Σx² − sum²)
    *
    * where sum/Σx² are the group's integer sums of `value` (callers
    * quantize, e.g. money → cents) and n counts the group's NON-NULL
    * values — sum() skips nulls, so n must too or the algebra above
    * inflates n and mis-flags every row in any group containing nulls.
    * Null-valued rows themselves never flag (dev is null → 0). Groups
    * with n < 2 never flag (σ is meaningless). Output: the input
    * columns + `n` (non-null group size) + `outlier` (INT 0/1).
    *
    * Plan shape: ONE map-side-combined aggregate for the (n, sum, sumsq)
    * table — |groups| rows, AQE broadcasts it — and one equi-join back;
    * the fact side never shuffles when the stats table broadcasts.
    *
    * Overflow bound (callers must check at their scale): the comparison
    * needs `kDen²·(n·maxAbs)²` and `kNum²·n·maxAbs²` within ±9.2e18
    * (long). E.g. cents ≤ 10⁶ (a $10k cap) allows n up to ~10⁶ per group
    * at k = 3/1. Beyond that, lift the two product expressions to
    * DECIMAL(38,0) — the structure is unchanged.
    */
  def flagOutliers(df: DataFrame, groupCols: Seq[String], value: Column,
                   kNum: Long, kDen: Long): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(kNum > 0 && kDen > 0, "threshold k = kNum/kDen must be positive")
    val v = value.cast("long")
    val stats = df.groupBy(groupCols.map(col): _*)
      .agg(count(v).as("n"), sum(v).as("__sum"), sum(v * v).as("__sumsq"))
    val dev = col("n") * v - col("__sum")
    val varn = col("n") * col("__sumsq") - col("__sum") * col("__sum")
    // null-safe join back: see joinStatsBack — a plain equi-join would
    // drop null-keyed rows instead of flagging them 0 within their group
    joinStatsBack(df, stats, groupCols)
      .withColumn("outlier",
        coalesce((col("n") >= 2 &&
          lit(kDen * kDen) * dev * dev > lit(kNum * kNum) * varn).cast("int"),
          lit(0)))
      .drop("__sum", "__sumsq")
  }
}
