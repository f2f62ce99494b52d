package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (Some(1L), Some("b"), 2.5),
    (Some(2L), None, 1.0),
    (None, Some("a"), 1.0)
  ).toDF("id", "s", "x")

  test("profile computes counts, nulls, exact distinct, min/max per column") {
    val p = Profile.profile(df, exactDistinct = true)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(p("id") == ((3L, 1L, 2L, "1", "2")))
    assert(p("s") == ((3L, 1L, 2L, "a", "b")))
    assert(p("x") == ((3L, 0L, 2L, "1.0", "2.5")))
  }

  test("profile tolerates non-orderable (map) columns as count-only") {
    val withMap = df.withColumn("m", map(lit("k"), col("x")))
    val row = Profile.profile(withMap).filter(col("column") === "m").collect().head
    assert(row.getLong(1) == 3L && row.getLong(2) == 0L)
    assert(row.isNullAt(3) && row.isNullAt(4) && row.isNullAt(5))
  }

  test("groupQuantiles exact mode interpolates like the SQL percentile definition") {
    val data = Seq(("a", 1), ("a", 2), ("a", 3), ("a", 4), ("b", 10)).toDF("g", "v")
    val got = Profile.groupQuantiles(data, Seq("g"), "v", Seq(0.5), exact = true)
      .as[(String, Double)].collect().toMap
    assert(got("a") == 2.5 && got("b") == 10.0)
    // approx mode still lands on a real data value
    val approx = Profile.groupQuantiles(data, Seq("g"), "v", Seq(0.5))
      .as[(String, Double)].collect().toMap
    assert(Set(2.0, 3.0).contains(approx("a")))
  }

  test("default (approx) profile is a single aggregate without Expand") {
    val plan = Profile.profile(df).queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan)
  }
  test("histogram: exact integer buckets, observed ranges, empty/degenerate inputs") {
    val df = (0L until 160L).map(v => Tuple1(v)).toDF("v")
    val got = Profile.histogram(df, "v", 16)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // 160 values over [0,159], width 160 -> 10 per bucket, exact ranges
    assert(got == (0L until 16L).map(b => (b, 10L, b * 10, b * 10 + 9)))
    // all-equal column: one bucket holds everything
    val const = Seq(7L, 7L, 7L).map(Tuple1(_)).toDF("v")
    val g2 = Profile.histogram(const, "v", 8)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(g2 == Seq((0L, 3L, 7L, 7L)))
    // empty input -> empty histogram (no NPE on null bounds)
    val empty = df.filter(col("v") < 0)
    assert(Profile.histogram(empty, "v", 4).count() == 0)
    // NULL values are excluded, never an out-of-contract bucket=NULL row
    val withNulls = Seq(Some(1L), Some(2L), None).toDF("v")
    val g3 = Profile.histogram(withNulls, "v", 2)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(g3 == Seq((0L, 1L, 1L, 1L), (1L, 1L, 2L, 2L)))
  }

  test("expectations: one scan, per-rule counts, NULL predicates violate") {
    val df = Seq(
      (Some(1L), Some("en"), 100L),
      (Some(2L), Some("de"), 10L),
      (Some(3L), None, 200L),       // NULL lang -> lang rule violates
      (None, Some("en"), 300L)      // NULL id
    ).toDF("id", "lang", "n")
    val got = Profile.expectations(df, Seq(
        "id_not_null" -> col("id").isNotNull,
        "lang_known" -> col("lang").isin("en", "de"),
        "n_at_least_50" -> (col("n") >= 50L)))
      .as[(String, Long, Long, Int)].collect().toSeq
    assert(got == Seq(
      ("id_not_null", 4L, 1L, 0),
      ("lang_known", 4L, 1L, 0),     // NULL lang counts as a violation
      ("n_at_least_50", 4L, 1L, 0)))
    // all-pass table: pass flag flips to 1
    val clean = Profile.expectations(df.filter(col("id").isNotNull && col("lang").isNotNull),
        Seq("id_not_null" -> col("id").isNotNull))
      .as[(String, Long, Long, Int)].collect().toSeq
    assert(clean == Seq(("id_not_null", 2L, 0L, 1)))
    // one scan: a single aggregate, no join/union of per-rule scans
    val plan = Profile.expectations(df, Seq(
        "a" -> col("id").isNotNull, "b" -> (col("n") > 0L)))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Union") && !plan.contains("Join"), plan)
  }

  test("groupQuantiles approx mode stays inside a ±2% rank band on skewed data") {
    // Zipf-shaped: value i appears ~2000/i times — the skew that breaks
    // naive samplers
    val rows = (1 to 200).flatMap(i => Seq.fill(2000 / i)(("g", i)))
    val df = rows.toDF("g", "v")
    val probs = Seq(0.5, 0.9, 0.99)
    def q(p: Double, exact: Boolean): Double =
      Profile.groupQuantiles(df, Seq("g"), "v", Seq(p), exact = exact)
        .select(col(s"p${(p * 100).round}")).as[Double].head()
    for (p <- probs) {
      val approx = q(p, exact = false)
      val lo = q(math.max(0.0, p - 0.02), exact = true)
      val hi = q(math.min(1.0, p + 0.02), exact = true)
      assert(approx >= lo - 1e-9 && approx <= hi + 1e-9,
        s"p=$p approx=$approx outside [$lo, $hi]")
    }
  }

  test("distinct sketches: merged slices == direct union estimate, exact on small sets") {
    val df = (1 to 30000).map(i => (i % 3, s"day${i % 5}", i % 2743))
      .toDF("g", "day", "v")
    // sketch per (g, day) slice — the persisted nightly table
    val slices = Profile.distinctSketch(df, Seq("g", "day"), "v")
    assert(slices.count() == 15)
    // merging slices re-grouped by g == sketching each g's data directly
    val merged = Profile.mergeDistinctSketches(slices, Seq("g"))
      .as[(Int, Long)].collect().toMap
    val direct = df.groupBy("g")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("v"), lit(12))).as("d"))
      .as[(Int, Long)].collect().toMap
    assert(merged == direct)
    // global merge estimates the full distinct count within HLL error
    val global = Profile.mergeDistinctSketches(slices)
      .select("n_distinct").as[Long].head()
    assert(math.abs(global - 2743L) < 2743 * 0.05, s"global=$global")
    // exactness on small distinct sets (sparse mode is exact)
    val small = (1 to 1000).map(i => ("s", i % 7)).toDF("g", "v")
    val est = Profile.mergeDistinctSketches(
        Profile.distinctSketch(small, Seq("g"), "v"))
      .select("n_distinct").as[Long].head()
    assert(est == 7L)
  }

  test("keySkew: heaviest keys, deterministic tie order, exact ppm share") {
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq.fill(3)("c") ++
      Seq("d")).toDF("k")
    val got = Profile.keySkew(df, Seq("k"), k = 3)
      .select("k", "cnt", "rank", "n_keys", "ppm")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // ties (b=c=3) break by key ascending; ppm is integer floor of 1e6
    assert(got == Seq(
      ("a", 6L, 1L, 4L, 6L * 1000000L / 13L),
      ("b", 3L, 2L, 4L, 3L * 1000000L / 13L),
      ("c", 3L, 3L, 4L, 3L * 1000000L / 13L)))
    // k larger than the key universe returns every key
    assert(Profile.keySkew(df, Seq("k"), k = 100).count() == 4L)
    // a NULL key is a key (often the heaviest one in dirty data): it
    // counts, ranks, and carries its share like any other
    val withNulls = (Seq.fill(5)(Option.empty[String]) ++
      Seq.fill(2)(Some("a"))).toDF("k")
    val nulls = Profile.keySkew(withNulls, Seq("k"), k = 2)
      .select("k", "cnt", "rank").as[(Option[String], Long, Long)]
      .collect().toSeq
    assert(nulls == Seq((None, 5L, 1L), (Some("a"), 2L, 2L)))
    // bounded plan: an ObjectHashAggregate heap, never a window sort
    val plan = Profile.keySkew(df, Seq("k"), k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }

  // the sketch's md5-bucket convention, recomputed independently
  private def cmsBucketRef(item: String, r: Int, width: Int): Long = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$item:$r".getBytes("UTF-8"))
    val hex = digest.take(4).map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16) % width
  }

  test("cmsSketch/cmsEstimate == driver mirror; never under-counts; merge is exact algebra") {
    val depth = 3; val width = 8 // tiny width: collisions guaranteed
    val items = Seq("a", "a", "a", "b", "b", "c", "d", "e", "f", "g")
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val df = items.zipWithIndex
      .map { case (it, i) => (i % 2, it) }.toDF("slice", "item")

    // driver mirror of the whole sketch table
    val counters = items.flatMap(it => (0 until depth).map(r =>
        (r, cmsBucketRef(it, r, width))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sk = Profile.cmsSketch(df, col("item"), depth, width)
    val got = sk.as[(Int, Long, Long)].collect()
      .map { case (r, b, c) => ((r, b), c) }.toMap
    assert(got == counters)

    // estimates: exact min-over-rows mirror, and never below the truth
    val probes = Seq("a", "b", "c", "g", "zzz")
    val est = Profile.cmsEstimate(sk, probes, depth, width)
      .as[(String, Long)].collect().toMap
    val mirror = probes.map(it => it -> (0 until depth)
      .map(r => counters.getOrElse((r, cmsBucketRef(it, r, width)), 0L))
      .min).toMap
    assert(est == mirror)
    probes.foreach { it =>
      assert(est(it) >= truth.getOrElse(it, 0L), s"under-count for $it")
    }

    // merge algebra: per-slice sketches summed == the direct sketch
    val sliced = Profile.cmsSketch(df, col("item"), depth, width,
      sliceCols = Seq("slice"))
    val merged = Profile.cmsMerge(sliced)
      .as[(Int, Long, Long)].collect().sorted.toSeq
    assert(merged == sk.as[(Int, Long, Long)].collect().sorted.toSeq)
    // and sliced estimates survive the re-grouped keys
    val perSlice = Profile.cmsEstimate(sliced, Seq("a"), depth, width,
      sliceCols = Seq("slice"))
      .as[(Int, String, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(perSlice(0) + perSlice(1) >= truth("a"))

    // NULL items are skipped, not hashed
    val withNull = Seq(Some("x"), None, Some("x")).toDF("item")
    val nullSk = Profile.cmsSketch(withNull, col("item"), depth, width)
    assert(Profile.cmsEstimate(nullSk, Seq("x"), depth, width)
      .as[(String, Long)].head()._2 >= 2L)
    assert(nullSk.agg(sum("cnt")).as[Long].head() == depth * 2L)

    intercept[IllegalArgumentException] {
      Profile.cmsSketch(df, col("item"), 0, width)
    }
    intercept[IllegalArgumentException] {
      Profile.cmsEstimate(sk, Nil, depth, width)
    }
  }

  test("categoricalDrift: ppm-quantized shares, one-sided categories, NULL category, TVD") {
    val a = Seq("x", "x", "x", "y").toDF("c")
    val b = Seq("x", "y", "z", "z").toDF("c")
    val drift = Profile.categoricalDrift(a, b, col("c"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(drift("x") == ("x", 3L, 1L, 750000L, 250000L, 500000L))
    assert(drift("y") == ("y", 1L, 1L, 250000L, 250000L, 0L))
    // z exists only in b: share 0 on the a side
    assert(drift("z") == ("z", 0L, 2L, 0L, 500000L, 500000L))
    assert(Profile.totalVariationPpm(a, b, col("c"))
      .as[Long].head() == 500000L)
    // identical mixes → 0; disjoint supports → 1_000_000
    assert(Profile.totalVariationPpm(a, a, col("c")).as[Long].head() == 0L)
    val w = Seq("p", "q").toDF("c")
    assert(Profile.totalVariationPpm(a, w, col("c")).as[Long].head() == 1000000L)
    // floor quantization: thirds floor to 333333 ppm each
    val thirds = Seq("u", "v", "w").toDF("c")
    val q = Profile.categoricalDrift(thirds, thirds, col("c"))
      .select("share_a_ppm").as[Long].collect().toSeq
    assert(q == Seq(333333L, 333333L, 333333L))
    // NULL category is a real category on both sides
    val withNull = Seq(Some("x"), None, None).toDF("c")
    val nd = Profile.categoricalDrift(withNull, withNull, col("c"))
      .as[(Option[String], Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._6).toMap
    assert(nd(None) == 0L && nd(Some("x")) == 0L)
    // empty side: the other side's categories all drift at full share
    val empty = spark.emptyDataset[String].toDF("c")
    val oneSided = Profile.categoricalDrift(a, empty, col("c"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(oneSided.forall(r => r._3 == 0L && r._5 == 0L && r._6 == r._4))
  }

  test("categoricalDrift groupCols: per-slice shares, one-sided slices, null slice keys") {
    val a = Seq(("en", "web"), ("en", "web"), ("en", "book"),
      ("fr", "web")).toDF("lang", "src")
    val b = Seq(("en", "web"), ("en", "book"), ("en", "book"),
      ("de", "web")).toDF("lang", "src")
    val d = Profile.categoricalDrift(a, b, col("src"), groupCols = Seq("lang"))
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // en: a = {web 2/3, book 1/3}, b = {web 1/3, book 2/3}
    assert(d(("en", "web")) == ("en", "web", 2L, 1L, 666666L, 333333L, 333333L))
    assert(d(("en", "book")) == ("en", "book", 1L, 2L, 333333L, 666666L, 333333L))
    // fr only in a, de only in b: full share vs 0 within their slices
    assert(d(("fr", "web")) == ("fr", "web", 1L, 0L, 1000000L, 0L, 1000000L))
    assert(d(("de", "web")) == ("de", "web", 0L, 1L, 0L, 1000000L, 1000000L))
    // per-slice TVD: en drifts by 1/3, one-sided slices at the max
    val tv = Profile.totalVariationPpm(a, b, col("src"), Seq("lang"))
      .as[(String, Long)].collect().toMap
    assert(tv("en") == 333333L && tv("fr") == 500000L && tv("de") == 500000L)
    // NULL slice key is a real slice
    val an = Seq((Option.empty[String], "x"), (Some("en"), "x")).toDF("lang", "src")
    val nd = Profile.categoricalDrift(an, an, col("src"), Seq("lang"))
      .select("lang").as[Option[String]].collect().toSet
    assert(nd == Set(None, Some("en")))
    // Nil groupCols stays the global monitor (back-compat)
    assert(Profile.totalVariationPpm(a, a, col("src")).as[Long].head() == 0L)
  }

  test("numericDrift: reference-side equi-depth cuts, shifted slice, identical slice, NULLs") {
    // reference: 1..8 → k=4 equi-depth buckets {1,2},{3,4},{5,6},{7,8}
    val a = (1L to 8L).toDF("v")
    val same = Profile.numericDrift(a, a, col("v"), k = 4)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(same.keySet == Set(0L, 1L, 2L, 3L))
    assert(same.values.forall(r => r._2 == 2L && r._3 == 2L && r._6 == 0L))
    // b shifted up: everything lands in the reference's top bucket
    val b = Seq(100L, 200L, 300L).toDF("v")
    val shifted = Profile.numericDrift(a, b, col("v"), k = 4)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(shifted(3L)._3 == 3L && shifted(3L)._5 == 1000000L)
    assert(shifted(0L)._3 == 0L && shifted(0L)._6 == 250000L)
    // values below the reference minimum land in bucket 0
    val low = Seq(-50L).toDF("v")
    val lowD = Profile.numericDrift(a, low, col("v"), k = 4)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(lowD(0L)._3 == 1L)
    // NULL metric values form their own bucket on both sides
    val withNull = Seq(Some(1L), Some(2L), None).toDF("v")
    val nd = Profile.numericDrift(withNull, withNull, col("v"), k = 2)
      .select("bucket").as[Option[Long]].collect().toSet
    assert(nd.contains(None))
    // duplicate-heavy reference: one distinct value → ONE cut at its max,
    // so ≤-reference values share bucket 0 and anything above drifts
    // into bucket 1 — upward drift stays visible even off a degenerate
    // reference
    val dup = Seq(5L, 5L, 5L, 5L).toDF("v")
    val dd = Profile.numericDrift(dup, Seq(4L, 5L, 6L).toDF("v"), col("v"), k = 4)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(dd.keySet == Set(0L, 1L))
    assert(dd(0L)._2 == 4L && dd(0L)._3 == 2L)
    assert(dd(1L)._2 == 0L && dd(1L)._3 == 1L)
    intercept[IllegalArgumentException] {
      Profile.numericDrift(a, b, col("v"), k = 1)
    }
  }

  test("quantileSketch: dyadic node mirror, one-sided rank, merge is exact algebra") {
    val levels = 8; val depth = 3; val width = 512
    val vals: Seq[Long] = (0L until 100L) ++ Seq(5L, 5L, 50L, 50L, 50L)
    val df = vals.zipWithIndex.map { case (v, i) => (i % 2, v) }
      .toDF("slice", "v")
    val sk = Profile.quantileSketch(df, col("v"), levels, depth, width)

    // driver mirror of the whole sketch table from the md5 convention
    val counters = vals
      .flatMap(v => for (l <- 0 until levels; r <- 0 until depth)
        yield (l, r, cmsBucketRef(s"$l@${v >> l}", r, width)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = sk.as[(Int, Int, Long, Long)].collect()
      .map { case (l, r, b, c) => ((l, r, b), c) }.toMap
    assert(got == counters)

    // rank estimates == left-sibling decomposition mirror, never below truth
    val probes = Seq(0L, 1L, 7L, 50L, 99L, 100L, 255L)
    val est = Profile.quantileRank(sk, probes, levels, depth, width)
      .as[(Long, Long)].collect().toMap
    def mirrorRank(x: Long): Long =
      (0 until levels).filter(l => ((x >> l) & 1) == 1).map { l =>
        (0 until depth).map(r => counters.getOrElse(
          (l, r, cmsBucketRef(s"$l@${(x >> l) - 1}", r, width)), 0L)).min
      }.sum
    probes.foreach { x =>
      assert(est(x) == mirrorRank(x), s"mirror mismatch at $x")
      assert(est(x) >= vals.count(_ < x), s"under-count at $x")
    }
    assert(est(0L) == 0L)
    assert(est(255L) >= vals.size) // everything is < 255 except nothing

    // merge algebra: per-slice sketches summed == the direct global sketch
    val sliced = Profile.quantileSketch(df, col("v"), levels, depth, width,
      sliceCols = Seq("slice"))
    val merged = Profile.quantileSketchMerge(sliced)
      .as[(Int, Int, Long, Long)].collect().sorted.toSeq
    assert(merged == sk.as[(Int, Int, Long, Long)].collect().sorted.toSeq)
  }

  test("quantileEstimate: uniform slices land near true quantiles, exact N, empty in → empty out") {
    val levels = 10; val depth = 3; val width = 256
    val df = (0L until 1000L).map(v => (if (v < 500) 0 else 1, v))
      .toDF("slice", "v")
    val sk = Profile.quantileSketch(df, col("v"), levels, depth, width)
    val qs = Seq(250000L, 500000L, 750000L, 990000L)
    val out = Profile.quantileEstimate(sk, qs, levels, depth, width)
      .as[(Long, Long, Long)].collect()
    assert(out.forall(_._3 == 1000L)) // N is exact, not estimated
    val byQ = out.map(r => r._1 -> r._2).toMap
    assert(math.abs(byQ(250000L) - 250L) <= 30, s"p25 ${byQ(250000L)}")
    assert(math.abs(byQ(500000L) - 500L) <= 30, s"p50 ${byQ(500000L)}")
    assert(math.abs(byQ(750000L) - 750L) <= 30, s"p75 ${byQ(750000L)}")
    assert(math.abs(byQ(990000L) - 990L) <= 30, s"p99 ${byQ(990000L)}")

    // per-slice: slice 0 holds 0..499, slice 1 holds 500..999
    val sliced = Profile.quantileSketch(df, col("v"), levels, depth, width,
      sliceCols = Seq("slice"))
    val perSlice = Profile.quantileEstimate(sliced, Seq(500000L), levels,
      depth, width, sliceCols = Seq("slice"))
      .as[(Int, Long, Long, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(math.abs(perSlice(0) - 250L) <= 30, s"slice0 ${perSlice(0)}")
    assert(math.abs(perSlice(1) - 750L) <= 30, s"slice1 ${perSlice(1)}")

    // empty sketch → empty output (not an error, not a fabricated zero)
    val empty = Profile.quantileSketch(df.filter(col("v") < 0), col("v"),
      levels, depth, width)
    assert(Profile.quantileEstimate(empty, qs, levels, depth, width).isEmpty)
  }

  test("quantileSketch: NULL metrics skipped, out-of-domain fails loud, param guards") {
    val df = Seq(Some(5L), None, Some(7L)).toDF("v")
    val sk = Profile.quantileSketch(df, col("v"), 4, 2, 8)
    assert(sk.agg(sum("cnt")).as[Long].head() == 2L * 4 * 2)

    def domainError(vals: Seq[Long]): Unit = {
      val e = intercept[Throwable] {
        Profile.quantileSketch(vals.toDF("v"), col("v"), 4, 2, 8).collect()
      }
      val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
      assert(msgs.contains("out of domain"), msgs)
    }
    domainError(Seq(16L)) // levels=4 → domain [0, 16)
    domainError(Seq(-1L))

    intercept[IllegalArgumentException](
      Profile.quantileSketch(df, col("v"), 0, 2, 8))
    intercept[IllegalArgumentException](
      Profile.quantileSketch(df, col("v"), 63, 2, 8))
    intercept[IllegalArgumentException](
      Profile.quantileRank(sk, Nil, 4, 2, 8))
    intercept[IllegalArgumentException](
      Profile.quantileRank(sk, Seq(16L), 4, 2, 8)) // probe must be < 2^levels
    intercept[IllegalArgumentException](
      Profile.quantileEstimate(sk, Seq(0L), 4, 2, 8)) // q_ppm >= 1
    intercept[IllegalArgumentException](
      Profile.quantileEstimate(sk, Seq(1000001L), 4, 2, 8))
  }

  test("driftAlarm: debounce — sustained breach pages, single spike and breach-gap-breach do not") {
    import spark.implicits._
    // one slice per debounce case; metric = the breach decision input
    val stats = Seq(
      ("sustained", 0L, 5L), ("sustained", 1L, 9L), ("sustained", 2L, 9L),
      ("spike", 0L, 1L), ("spike", 1L, 9L), ("spike", 2L, 1L),
      ("gap", 0L, 9L), ("gap", 1L, 1L), ("gap", 2L, 9L),
      ("nulls", 0L, 9L), ("nulls", 2L, 9L))
      .toDF("slice", "__batch_id", "m")
      // the nulls slice: batch 1 carries a NULL metric (absent side)
      .union(Seq(("nulls", 1L)).toDF("slice", "__batch_id")
        .withColumn("m", lit(null).cast("long")))
    val got = Profile.driftAlarm(stats, Seq("slice"), col("__batch_id"),
        breach = col("m") >= 8L, consecutive = 2)
      .as[(String, Long, Int, Int)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // sustained: breaches at 1,2 -> alarms at 2 only (batch 1 is the
    // FIRST breach; 2 consecutive reached at batch 2)
    assert(got(("sustained", 0L)) == ((0, 0)))
    assert(got(("sustained", 1L)) == ((1, 0)))
    assert(got(("sustained", 2L)) == ((1, 1)))
    // spike: one breaching batch, never an alarm
    assert(got(("spike", 1L)) == ((1, 0)))
    assert(got.filter(_._1._1 == "spike").values.forall(_._2 == 0))
    // gap: breach-gap-breach resets the counter
    assert(got.filter(_._1._1 == "gap").values.forall(_._2 == 0))
    // NULL metric reads as non-breach, so it also resets
    assert(got(("nulls", 1L)) == ((0, 0)))
    assert(got.filter(_._1._1 == "nulls").values.forall(_._2 == 0))
    // consecutive = 1: no debounce, every breach alarms
    val one = Profile.driftAlarm(stats, Seq("slice"), col("__batch_id"),
        breach = col("m") >= 8L, consecutive = 1)
      .as[(String, Long, Int, Int)].collect()
    assert(one.forall(r => r._3 == r._4))
    intercept[IllegalArgumentException](
      Profile.driftAlarm(stats, Seq("slice"), col("__batch_id"),
        col("m") >= 8L, consecutive = 0))
    // a slice column named after a reserved output column would produce
    // duplicate output names and an ambiguous window orderBy — refused
    // loudly up front instead of failing analysis with an opaque error
    val clash = stats.withColumnRenamed("slice", "batch_id")
    val err = intercept[IllegalArgumentException](
      Profile.driftAlarm(clash, Seq("batch_id"), col("__batch_id"),
        col("m") >= 8L))
    assert(err.getMessage.contains("reserved"))
  }
}
