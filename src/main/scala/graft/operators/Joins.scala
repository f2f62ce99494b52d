package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Join operators Spark lacks natively, built scale-first.
  */
object Joins {

  /** AS-OF (left) join: for each left row, attach per key the LATEST right
    * row with `right.ts <= left.ts` (`direction = "backward"`, the
    * default), the EARLIEST right row with `right.ts >= left.ts`
    * (`direction = "forward"`), or whichever of the two is CLOSER in
    * time (`direction = "nearest"`, equal distance breaking toward
    * backward) — the full pandas `merge_asof` direction surface, the
    * canonical feature-attachment join of training-data pipelines
    * ("state of the user at event time" / "next action after the
    * event"). Optional `tolerance` (in the ts
    * column's natural units — seconds for timestamps) nulls the match
    * when the attached row is further than that from the left row, the
    * pandas `merge_asof` contract.
    *
    * Implementation is the union-sort trick, NOT a range join: tag both
    * sides, union, one window pass per key ordered by (ts, side) carrying
    * the last-seen right row forward (time-reversed for `forward`).
    * Cost = ONE shuffle + sort of |L| + |R| rows — no range-condition row
    * explosion, no broadcast requirement, and AQE handles skewed keys;
    * the tolerance is a post-mask, not a join condition, so it never
    * changes the plan shape. Right columns come back prefixed
    * (`rightPrefix`); left rows with no qualifying right row get nulls.
    * Ties on (key, ts) between right rows break toward the largest
    * right-row ordering in both directions (deterministic).
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String,
           rightPrefix: String = "r_",
           direction: String = "backward",
           tolerance: Option[Double] = None): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got $direction")
    require(tolerance.forall(_ >= 0), "tolerance must be non-negative")
    // the tolerance mask (and nearest's distance compare) measures
    // distance via cast-to-double; a ts type where that cast yields NULL
    // (DATE, non-numeric strings) would silently null EVERY match
    // instead of failing — reject it up front
    if (tolerance.isDefined || direction == "nearest") {
      import org.apache.spark.sql.types.{NumericType, TimestampNTZType, TimestampType}
      Seq(s"left.$leftTs" -> left.schema(leftTs).dataType,
          s"right.$rightTs" -> right.schema(rightTs).dataType).foreach {
        case (nm, dt) =>
          require(dt.isInstanceOf[NumericType] ||
              dt == TimestampType || dt == TimestampNTZType,
            s"asOf tolerance/nearest needs a numeric or timestamp ts column; " +
              s"$nm is $dt (its cast to double is null, which would null every match)")
      }
    }
    val rRenamed = right.columns.filterNot(keys.contains)
      .foldLeft(right)((d, c) => d.withColumnRenamed(c, rightPrefix + c))
    val lPayload = left.columns.filterNot(keys.contains)
    val rPayload = rRenamed.columns.filterNot(keys.contains)
    val lType = StructType(left.schema.fields.filterNot(f => keys.contains(f.name)))
    val rType = StructType(rRenamed.schema.fields.filterNot(f => keys.contains(f.name)))

    val lSide = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__t"), lit(1).as("__src"),
        struct(lPayload.map(col): _*).as("__l"),
        lit(null).cast(rType).as("__r")): _*)
    val rSide = rRenamed.select(
      keys.map(col) ++ Seq(
        col(rightPrefix + rightTs).as("__t"), lit(0).as("__src"),
        lit(null).cast(lType).as("__l"),
        struct(rPayload.map(col): _*).as("__r")): _*)

    // right rows sort BEFORE left rows at equal ts (__src 0 < 1) => the
    // as-of comparison is INCLUSIVE in both directions. For `forward` the
    // time axis reverses; __src stays ascending so equal-ts right rows
    // still precede the left row in iteration order. The right-row
    // tiebreak orders only ORDERABLE right columns — a map column in the
    // payload would fail analysis inside an ordering struct (same guard
    // Dedup.exact applies).
    val rOrderable = rType.fields.filter(f =>
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(f.dataType))
      .map(f => col(s"__r.${f.name}"))
    val tieBreak: Seq[org.apache.spark.sql.Column] =
      if (rOrderable.isEmpty) Nil else Seq(struct(rOrderable: _*))
    def carryWindow(reversed: Boolean) = {
      val tOrder = if (reversed) col("__t").desc else col("__t")
      // a keyless as-of join is INHERENTLY one global ordered carry — make
      // the single-partition intent explicit (constant key) instead of
      // tripping WindowExec's "no partition defined" WARN; keyed calls
      // (the scale path) partition by the join keys as before
      val parts = if (keys.isEmpty) Seq(lit(0)) else keys.map(col)
      Window.partitionBy(parts: _*)
        .orderBy(tOrder +: col("__src") +: tieBreak: _*)
        .rowsBetween(Window.unboundedPreceding, 0)
    }
    def distOf(carried: Column): Column =
      abs(carried.getField(rightPrefix + rightTs).cast("double") -
        col("__t").cast("double"))
    def tolMask(carried: Column): Column = tolerance match {
      case None => carried
      // natural-unit distance: timestamps cast to epoch seconds,
      // numerics to their value
      case Some(tol) =>
        when(distOf(carried) <= tol, carried).otherwise(lit(null).cast(rType))
    }
    val base = lSide.unionByName(rSide)
    val masked =
      if (direction != "nearest") {
        base
          .withColumn("__carried",
            last(col("__r"), ignoreNulls = true)
              .over(carryWindow(direction == "forward")))
          .filter(col("__src") === 1)
          .withColumn("__carried", tolMask(col("__carried")))
      } else {
        // NEAREST: both carries over ONE union (one exchange, two
        // in-partition sorts — no second shuffle, no join of two asOf
        // results); tolerance masks each side BEFORE the distance
        // compare, and equal distance breaks toward backward (the
        // pandas merge_asof contract)
        val both = base
          .withColumn("__cb",
            last(col("__r"), ignoreNulls = true).over(carryWindow(false)))
          .withColumn("__cf",
            last(col("__r"), ignoreNulls = true).over(carryWindow(true)))
          .filter(col("__src") === 1)
          .withColumn("__cb", tolMask(col("__cb")))
          .withColumn("__cf", tolMask(col("__cf")))
        both
          .withColumn("__carried",
            when(col("__cb").isNull, col("__cf"))
              .when(col("__cf").isNull, col("__cb"))
              .when(distOf(col("__cb")) <= distOf(col("__cf")), col("__cb"))
              .otherwise(col("__cf")))
          .drop("__cb", "__cf")
      }
    masked.select(keys.map(col) ++
      lPayload.map(c => col(s"__l.$c").as(c)) ++
      rPayload.map(c => col(s"__carried.$c").as(c)): _*)
  }

  /** RANGE JOIN (point-in-interval) WITHOUT an equi-key: each left "point"
    * row joins every right "interval" row with `lo <= point <= hi`.
    *
    * Spark plans a bare inequality join as BroadcastNestedLoopJoin (O(|L|·|R|)
    * comparisons, broadcast of a whole side) — a scale-killer. This operator
    * BINS the range dimension instead: the point side computes one bin
    * `floor(point / binWidth)`, the interval side explodes into every bin it
    * covers, and the join becomes a plain hash equi-join on the bin followed
    * by the exact range predicate. Each (point, interval) pair meets in
    * EXACTLY one bin (the point's), so no distinct is needed.
    *
    * Cost: one shuffle of |L| + |R|·(avg interval span / binWidth) rows.
    * Pick `binWidth` near the typical interval length — replication stays
    * O(1) per interval while bucket population stays selective. Numeric and
    * timestamp columns both work: values are cast to DOUBLE (timestamps →
    * epoch seconds) for binning only; the verify predicate compares the
    * original values.
    *
    * The reference has no join surface at all (SURVEY §2.5); this extends the
    * engine the same way [[asOf]] does, for the interval-attachment shapes
    * ("which maintenance window / session / price band does this row fall
    * in") that training-data pipelines hit constantly.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
                pointCol: String, loCol: String, hiCol: String,
                binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val pBin = floor(points.col(pointCol).cast("double") / binWidth).cast("long")
    val iLo = floor(intervals.col(loCol).cast("double") / binWidth).cast("long")
    val iHi = floor(intervals.col(hiCol).cast("double") / binWidth).cast("long")
    val p = points.withColumn("__bin", pBin)
    val i = intervals.withColumn("__bin", explode(sequence(iLo, iHi)))
    p.join(i, Seq("__bin"))
      .filter(p.col(pointCol) >= i.col(loCol) && p.col(pointCol) <= i.col(hiCol))
      .drop("__bin")
  }

  /** INTERVAL-OVERLAP JOIN without an equi-key: pairs of rows (a from
    * `left`, b from `right`) whose intervals `[lo, hi]` intersect.
    *
    * Same binning idea as [[rangeJoin]], plus the canonical-bin trick to
    * emit each overlapping pair exactly once WITHOUT a distinct: two
    * overlapping intervals share every bin covering their intersection, so
    * the pair is kept only in the FIRST such bin, `floor(max(lo_a, lo_b) /
    * binWidth)` — a post-join filter, not a dedup shuffle.
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
                          leftLo: String, leftHi: String,
                          rightLo: String, rightHi: String,
                          binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def binned(df: DataFrame, lo: String, hi: String): DataFrame =
      df.withColumn("__bin", explode(sequence(
        floor(df.col(lo).cast("double") / binWidth).cast("long"),
        floor(df.col(hi).cast("double") / binWidth).cast("long"))))
    val l = binned(left, leftLo, leftHi)
    val r = binned(right, rightLo, rightHi)
    l.join(r, Seq("__bin"))
      .filter(l.col(leftLo) <= r.col(rightHi) && r.col(rightLo) <= l.col(leftHi))
      .filter(col("__bin") === floor(
        greatest(l.col(leftLo).cast("double"), r.col(rightLo).cast("double")) / binWidth)
        .cast("long"))
      .drop("__bin")
  }

  /** Inner equi-join with KEY SALTING for skew: the left side spreads each
    * hot key across `saltBuckets` partitions (deterministic per-row salt),
    * the right side replicates `saltBuckets`×. Result is exactly the plain
    * join; the shuffle's largest partition shrinks by the salt factor.
    * Use when one side has power-law keys and the other is too big to
    * broadcast (AQE's skew handling covers sort-merge joins; this covers
    * the cases it can't re-split, e.g. a single monster key feeding an
    * aggregation).
    */
  def saltedInner(left: DataFrame, right: DataFrame, keys: Seq[String],
                  saltBuckets: Int): DataFrame = {
    val lSalt = pmod(xxhash64(struct(left.columns.map(col): _*)), lit(saltBuckets))
      .cast("int")
    val l = left.withColumn("__salt", lSalt)
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }

  /** MERGE OVERLAPPING INTERVALS per key (gaps-and-islands): closed
    * intervals `[start, end]` that overlap OR touch an earlier
    * interval's span coalesce into one row —
    * (keys…, start, end, n_merged) — the temporal-normalization step
    * behind availability windows, coverage spans, validity-period
    * dedup, and sessionization with explicit extents.
    *
    * Island detection is the classic prefix trick: in per-key
    * (start, end) order, a row OPENS a new island iff its start exceeds
    * the running max of every earlier end (not just the previous row's —
    * an early long interval can swallow several later short ones); the
    * island id is the running count of opens, and one hash aggregate per
    * (key, island) emits the merged span.
    *
    * Scale: per-KEY windows only — the [[graft.operators
    * .Analytics.timeSeriesStats]] argument: a window partitioned by the
    * entity key sorts each entity's own rows, parallel across keys;
    * nothing global sorts. The follow-up aggregate is map-side combined.
    * A single entity with millions of intervals is the documented
    * hot-key hazard (same as every per-entity ordered computation).
    */
  def mergeIntervals(df: DataFrame, keyCols: Seq[String],
                     startCol: String, endCol: String): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    // a NULL bound is not an interval: it would sort arbitrarily and
    // poison the running-max chain — drop such rows explicitly rather
    // than emit garbage islands (callers wanting them must repair
    // upstream)
    val rows = df.filter(col(startCol).isNotNull && col(endCol).isNotNull)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val opens = when(col(startCol) > prevMax, 1L).otherwise(0L)
    rows.withColumn("__island", sum(opens).over(w))
      .groupBy((keyCols :+ "__island").map(col): _*)
      .agg(min(col(startCol)).as(startCol), max(col(endCol)).as(endCol),
        count(lit(1)).as("n_merged"))
      .drop("__island")
  }
}
