package graft

import graft.functions.TextFunctions._
import graft.operators.{Dedup, Multimodal, Similarity}
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._

/** One family section of the LLM-data-pipeline extension
  * battery (split out of ExtQueries.scala at round 19 — no
  * behavior change; see [[ExtQueries.all]] for the union).
  */
private[graft] object MaintenanceBattery {
  import Queries.{Q, table, events}
  import BatteryUtil._


  // Lake/stream MAINTENANCE twins: capabilities that normally run inside
  // foreachBatch or a nightly layout job, driven here as deterministic
  // batch pipelines so the driver's oracle sees them (they were
  // spec-only before — "driver-invisible surface").
  val queries: Seq[(String, Q)] = Seq(
    // INCREMENTAL VIEW MAINTENANCE end-to-end: base aggregate over the
    // "before" state + change feed (diffSnapshots with preimages) folded
    // by applyFeedToSums must EQUAL the direct aggregate over the "after"
    // state — which is exactly what the oracle computes. The feed carries
    // all three op kinds by construction: inserts (keys %13=0 absent
    // before), deletes (keys %11=0 absent after), updates (%7=0 value
    // shift), so every retraction path is exercised.
    "q_ivm_fold" -> Q(
      (s, dir) => {
        val base = table(s, dir, "orders").select(
          col("o_orderkey"), col("o_orderstatus"),
          round(col("o_totalprice") * 100).cast("long").as("v"))
        val before = base.filter(col("o_orderkey") % 13 =!= 0)
        val after = base.filter(col("o_orderkey") % 11 =!= 0)
          .withColumn("v",
            col("v") + when(col("o_orderkey") % 7 === 0, 500L).otherwise(0L))
        val feed = graft.operators.Lake.diffSnapshots(
          before, after, Seq("o_orderkey"), opCol = "_op", includeBefore = true)
        val agg0 = before.groupBy("o_orderstatus")
          .agg(sum(col("v")).as("sum_v"), count(lit(1)).as("n"))
        graft.streaming.ChangeStreams.applyFeedToSums(
          agg0, feed, Seq("o_orderstatus"), "v")
      },
      Some("""
        WITH base AS (SELECT o_orderkey, o_orderstatus,
            CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders),
        a AS (SELECT o_orderstatus,
            v + CASE WHEN o_orderkey % 7 = 0 THEN 500 ELSE 0 END AS v
          FROM base WHERE o_orderkey % 11 <> 0)
        SELECT o_orderstatus, CAST(sum(v) AS BIGINT) AS sum_v,
          CAST(count(*) AS BIGINT) AS n
        FROM a GROUP BY 1""")),

    // HLL SKETCH ALGEBRA: per-slice sketches built once, merged to a
    // coarser grouping without re-reading data. In the coupon-exact
    // regime (distinct-per-group far below the lgK=12 sketch's exact
    // capacity — true at the gate's sf) the merged estimate equals the
    // exact distinct count, so a plain COUNT(DISTINCT) oracle pins it.
    "q_hll_merge" -> Q(
      (s, dir) => {
        val slices = graft.operators.Profile.distinctSketch(
          table(s, dir, "documents")
            .withColumn("slice", col("doc_id") % 4),
          Seq("lang", "slice"), "doc_id")
        graft.operators.Profile.mergeDistinctSketches(slices, Seq("lang"))
      },
      Some("""SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct
             FROM documents GROUP BY 1""")),

    // COUNT-MIN SKETCH algebra: per-(lang, doc_id%4) slice sketches of
    // the token stream merged per lang, then point-frequency estimates
    // for three present tokens and one absent one. depth=3 × width=64 is
    // deliberately TIGHT (thousands of distinct tokens → real
    // collisions), so this row gates the genuinely-approximate regime:
    // the oracle recomputes the identical md5-bucket counter sums and
    // row-wise min in DuckDB — estimate equality, not just bounds. The
    // CMS invariant (never below truth) and exact merge algebra are
    // spec-pinned; the frequency twin of the q_hll_merge row.
    "q_cms" -> Q(
      (s, dir) => {
        val toks = table(s, dir, "documents")
          .withColumn("slice", col("doc_id") % 4)
          .select(col("lang"), col("slice"),
            explode(tokens(col("text"))).as("token"))
        val slices = graft.operators.Profile.cmsSketch(
          toks, col("token"), depth = 3, width = 64,
          sliceCols = Seq("lang", "slice"))
        val merged = graft.operators.Profile.cmsMerge(slices, Seq("lang"))
        graft.operators.Profile.cmsEstimate(
          merged, Seq("vector", "spark", "customer", "zzz_not_a_token"),
          depth = 3, width = 64, sliceCols = Seq("lang"))
      },
      Some(s"""
        WITH tok AS (SELECT lang, unnest($sqlTokens) AS token FROM documents),
        cms AS (SELECT lang, r.i AS r,
            CAST(('0x' || substring(md5(token || ':' || CAST(r.i AS VARCHAR)), 1, 8)) AS BIGINT) % 64 AS b,
            CAST(count(*) AS BIGINT) AS cnt
          FROM tok CROSS JOIN range(3) r(i) GROUP BY 1, 2, 3),
        probe AS (SELECT p.item, r.i AS r,
            CAST(('0x' || substring(md5(p.item || ':' || CAST(r.i AS VARCHAR)), 1, 8)) AS BIGINT) % 64 AS b
          FROM (SELECT unnest(['vector', 'spark', 'customer', 'zzz_not_a_token']) AS item) p
          CROSS JOIN range(3) r(i)),
        langs AS (SELECT DISTINCT lang FROM cms),
        j AS (SELECT l.lang, pr.item, pr.r, COALESCE(c.cnt, 0) AS cnt
          FROM langs l CROSS JOIN probe pr
          LEFT JOIN cms c ON c.lang = l.lang AND c.r = pr.r AND c.b = pr.b)
        SELECT lang, item, CAST(min(cnt) AS BIGINT) AS est
        FROM j GROUP BY 1, 2""")),

    // QUANTILE SKETCH (dyadic CMS) — the rank/quantile member of the
    // sketch family. Per-(lang, part) sketches merged to per-lang
    // (GROUP BY SUM exact algebra, so the oracle recomputes the merged
    // sketch directly from the data), then rank estimates via the
    // left-sibling dyadic decomposition — both sides pure md5-convention
    // integer arithmetic, bit-identical.
    "q_qsketch_rank" -> Q(
      (s, dir) => {
        val vals = table(s, dir, "documents")
          .select(col("lang"), (col("doc_id") % 4).as("part"),
            length(col("text")).cast("long").as("v"))
        val sliced = graft.operators.Profile.quantileSketch(
          vals, col("v"), levels = 12, depth = 3, width = 64,
          sliceCols = Seq("lang", "part"))
        val merged = graft.operators.Profile.quantileSketchMerge(
          sliced, Seq("lang"))
        graft.operators.Profile.quantileRank(
          merged, Seq(64L, 128L, 256L, 512L, 1024L),
          levels = 12, depth = 3, width = 64, sliceCols = Seq("lang"))
      },
      Some(s"""
        WITH vals AS (SELECT lang, CAST(length(text) AS BIGINT) AS v FROM documents),
        cms AS (SELECT lang, l.i AS l, r.i AS r,
            ${qsketchBucketSql("l.i", "(v >> l.i)", "r.i", 64)} AS b,
            CAST(count(*) AS BIGINT) AS cnt
          FROM vals CROSS JOIN range(12) l(i) CROSS JOIN range(3) r(i)
          GROUP BY 1, 2, 3, 4),
        probes AS (SELECT CAST(unnest([64, 128, 256, 512, 1024]) AS BIGINT) AS value),
        nodes AS (SELECT p.value, l.i AS l, r.i AS r,
            ${qsketchBucketSql("l.i", "((p.value >> l.i) - 1)", "r.i", 64)} AS b
          FROM probes p CROSS JOIN range(12) l(i) CROSS JOIN range(3) r(i)
          WHERE ((p.value >> l.i) & 1) = 1),
        langs AS (SELECT DISTINCT lang FROM cms),
        ne AS (SELECT lg.lang, n.value, n.l, MIN(COALESCE(c.cnt, 0)) AS ne
          FROM langs lg CROSS JOIN nodes n
          LEFT JOIN cms c ON c.lang = lg.lang AND c.l = n.l
            AND c.r = n.r AND c.b = n.b
          GROUP BY 1, 2, 3)
        SELECT lang, value, CAST(SUM(ne) AS BIGINT) AS est_rank
        FROM ne GROUP BY 1, 2""")),

    // The quantile-ESTIMATE twin: per-part sketches merged global, then
    // the integer dyadic-tree descent (t = max(1, N·q div 10⁶); left
    // child's CMS estimate decides the branch). The oracle replays the
    // walk as `levels` chained CTE steps — same arithmetic, same md5
    // buckets, bit-identical values.
    "q_qsketch_quantiles" -> Q(
      (s, dir) => {
        val vals = table(s, dir, "documents")
          .select((col("doc_id") % 4).as("part"),
            length(col("text")).cast("long").as("v"))
        val sliced = graft.operators.Profile.quantileSketch(
          vals, col("v"), levels = 12, depth = 3, width = 64,
          sliceCols = Seq("part"))
        val merged = graft.operators.Profile.quantileSketchMerge(sliced)
        graft.operators.Profile.quantileEstimate(
          merged, Seq(250000L, 500000L, 750000L, 990000L),
          levels = 12, depth = 3, width = 64)
      },
      qsketchQuantilesOracleSql(levels = 12, depth = 3, width = 64,
        qs = Seq(250000L, 500000L, 750000L, 990000L))),

    // KMV (k-minimum-values) sketch — the SET-OPERATIONS member of the
    // sketch family. Per-(lang, part) bottom-k sketches merged per lang
    // (exact algebra: bottom-k of a union of bottom-ks = bottom-k of the
    // union, so the oracle recomputes per-lang directly), then the
    // distinct estimate: exact below k, ⌊(k−1)·2⁶⁰ / h_k⌋ at k — the
    // division in DOUBLE on both engines by contract (operands exactly
    // representable / identically rounded). fr has exactly k=64 distinct
    // texts at sf0.01, so both branches gate.
    "q_kmv_distinct" -> Q(
      (s, dir) => {
        val docs = table(s, dir, "documents")
          .withColumn("part", col("doc_id") % 4)
        val sliced = graft.operators.Profile.kmvSketch(
          docs, col("text"), k = 64, sliceCols = Seq("lang", "part"))
        val merged = graft.operators.Profile.kmvMerge(
          sliced, k = 64, groupCols = Seq("lang"))
        graft.operators.Profile.kmvDistinct(merged, k = 64, Seq("lang"))
      },
      Some("""
        WITH h AS (SELECT DISTINCT lang,
            CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h
          FROM documents),
        ranked AS (SELECT lang, h,
            row_number() OVER (PARTITION BY lang ORDER BY h) AS rn FROM h),
        agg AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
            max(h) AS kth
          FROM ranked WHERE rn <= 64 GROUP BY 1)
        SELECT lang, n_kept,
          CASE WHEN n_kept < 64 THEN n_kept
               ELSE CAST(FLOOR(63.0 * 1152921504606846976.0
                               / CAST(kth AS DOUBLE)) AS BIGINT)
          END AS est_distinct
        FROM agg""")),

    // KMV set-overlap estimation between two corpora ("how much does
    // crawl B overlap crawl A") from two k-row sketches: combined
    // bottom-k, membership matches, jaccard_ppm = matches·10⁶ div
    // union_k, KMV union estimate, and the Beyer'07 intersection
    // estimate in exact BIGINT arithmetic — every join sketch×sketch,
    // never corpus×corpus. The corpora overlap by construction
    // (doc_id%3≠0 vs doc_id%2=0 → J = 0.4 on distinct texts).
    "q_kmv_overlap" -> Q(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val a = graft.operators.Profile.kmvSketch(
          docs.filter(col("doc_id") % 3 =!= 0), col("text"), k = 256)
        val b = graft.operators.Profile.kmvSketch(
          docs.filter(col("doc_id") % 2 === 0), col("text"), k = 256)
        graft.operators.Profile.kmvOverlap(a, b, k = 256)
      },
      Some("""
        WITH ha AS (SELECT DISTINCT
            CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h
          FROM documents WHERE doc_id % 3 <> 0),
        hb AS (SELECT DISTINCT
            CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h
          FROM documents WHERE doc_id % 2 = 0),
        ska AS (SELECT h FROM ha ORDER BY h LIMIT 256),
        skb AS (SELECT h FROM hb ORDER BY h LIMIT 256),
        u AS (SELECT DISTINCT h FROM (SELECT h FROM ska UNION ALL
                                      SELECT h FROM skb)
              ORDER BY h LIMIT 256),
        fl AS (SELECT u.h,
            (u.h IN (SELECT h FROM ska) AND u.h IN (SELECT h FROM skb))
              AS b2 FROM u),
        agg AS (SELECT CAST(count(*) AS BIGINT) AS union_k,
            CAST(sum(CASE WHEN b2 THEN 1 ELSE 0 END) AS BIGINT) AS matches,
            max(h) AS kth FROM fl),
        est AS (SELECT union_k, matches,
            CAST(matches * 1000000 // union_k AS BIGINT) AS jaccard_ppm,
            CASE WHEN union_k < 256 THEN union_k
                 ELSE CAST(FLOOR(255.0 * 1152921504606846976.0
                                 / CAST(kth AS DOUBLE)) AS BIGINT)
            END AS est_union
          FROM agg)
        SELECT union_k, matches, jaccard_ppm, est_union,
          CAST((est_union // union_k) * matches
               + ((est_union % union_k) * matches) // union_k AS BIGINT)
            AS est_intersection
        FROM est""")),

    // KMV set DIFFERENCE — the directional complement of q_kmv_overlap
    // over the same two corpora: combined-bottom-k hashes present in
    // exactly one sketch (only_a / only_b) and the Beyer'07 difference
    // estimates in the same exact BIGINT split arithmetic as the
    // intersection estimator. Sketch×sketch joins only.
    "q_kmv_diff" -> Q(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val a = graft.operators.Profile.kmvSketch(
          docs.filter(col("doc_id") % 3 =!= 0), col("text"), k = 256)
        val b = graft.operators.Profile.kmvSketch(
          docs.filter(col("doc_id") % 2 === 0), col("text"), k = 256)
        graft.operators.Profile.kmvDifference(a, b, k = 256)
      },
      Some("""
        WITH ha AS (SELECT DISTINCT
            CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h
          FROM documents WHERE doc_id % 3 <> 0),
        hb AS (SELECT DISTINCT
            CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h
          FROM documents WHERE doc_id % 2 = 0),
        ska AS (SELECT h FROM ha ORDER BY h LIMIT 256),
        skb AS (SELECT h FROM hb ORDER BY h LIMIT 256),
        u AS (SELECT DISTINCT h FROM (SELECT h FROM ska UNION ALL
                                      SELECT h FROM skb)
              ORDER BY h LIMIT 256),
        fl AS (SELECT u.h,
            u.h IN (SELECT h FROM ska) AS ia,
            u.h IN (SELECT h FROM skb) AS ib FROM u),
        agg AS (SELECT CAST(count(*) AS BIGINT) AS union_k,
            CAST(sum(CASE WHEN ia AND ib THEN 1 ELSE 0 END) AS BIGINT)
              AS matches,
            CAST(sum(CASE WHEN ia AND NOT ib THEN 1 ELSE 0 END) AS BIGINT)
              AS only_a,
            CAST(sum(CASE WHEN ib AND NOT ia THEN 1 ELSE 0 END) AS BIGINT)
              AS only_b,
            max(h) AS kth FROM fl),
        est AS (SELECT union_k, matches, only_a, only_b,
            CASE WHEN union_k < 256 THEN union_k
                 ELSE CAST(FLOOR(255.0 * 1152921504606846976.0
                                 / CAST(kth AS DOUBLE)) AS BIGINT)
            END AS est_union
          FROM agg)
        SELECT union_k, matches, only_a, only_b, est_union,
          CAST((est_union // union_k) * only_a
               + ((est_union % union_k) * only_a) // union_k AS BIGINT)
            AS est_a_minus_b,
          CAST((est_union // union_k) * only_b
               + ((est_union % union_k) * only_b) // union_k AS BIGINT)
            AS est_b_minus_a
        FROM est""")),

    // WEIGHTED KMV — total n_chars over the distinct-text universe per
    // lang, from one bounded-buffer scan: bottom-k hashes each carrying
    // max(weight), est_total_w = est_distinct·sum_w DIV n_kept in
    // DECIMAL(38,0)-exact arithmetic. k=72 gates BOTH branches at
    // sf0.01: de (70 distinct texts) and fr (64) land below k (the
    // formula degenerates to the exact sampled sum), en/es/zh at k (the
    // Horvitz–Thompson scale-up).
    "q_kmv_weighted" -> Q(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val sk = graft.operators.Profile.kmvSketchWeighted(
          docs, col("text"), col("n_chars"), k = 72, sliceCols = Seq("lang"))
        graft.operators.Profile.kmvWeightedSum(sk, k = 72, Seq("lang"))
      },
      Some("""
        WITH hw AS (SELECT lang,
            CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h,
            CAST(max(n_chars) AS BIGINT) AS w
          FROM documents GROUP BY 1, 2),
        ranked AS (SELECT lang, h, w,
            row_number() OVER (PARTITION BY lang ORDER BY h) AS rn FROM hw),
        agg AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
            CAST(sum(w) AS BIGINT) AS sum_w, max(h) AS kth
          FROM ranked WHERE rn <= 72 GROUP BY 1),
        est AS (SELECT lang, n_kept, sum_w,
            CASE WHEN n_kept < 72 THEN n_kept
                 ELSE CAST(FLOOR(71.0 * 1152921504606846976.0
                                 / CAST(kth AS DOUBLE)) AS BIGINT)
            END AS est_distinct
          FROM agg)
        SELECT lang, n_kept, sum_w, est_distinct,
          CAST(est_distinct * sum_w // n_kept AS BIGINT) AS est_total_w
        FROM est""")),

    // WEIGHTED KMV set operations — "how many BYTES of A are not in B",
    // not just how many documents: membership counts plus per-region
    // weight mass over the combined bottom-k, and the Horvitz–Thompson
    // scale-ups in DECIMAL(38,0)-exact arithmetic. Same corpora split
    // as q_kmv_diff, weight = n_chars.
    "q_kmv_wsets" -> Q(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val a = graft.operators.Profile.kmvSketchWeighted(
          docs.filter(col("doc_id") % 3 =!= 0), col("text"),
          col("n_chars"), k = 256)
        val b = graft.operators.Profile.kmvSketchWeighted(
          docs.filter(col("doc_id") % 2 === 0), col("text"),
          col("n_chars"), k = 256)
        graft.operators.Profile.kmvSetWeights(a, b, k = 256)
      },
      Some("""
        WITH ha AS (SELECT
            CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h,
            CAST(max(n_chars) AS BIGINT) AS w
          FROM documents WHERE doc_id % 3 <> 0 GROUP BY 1),
        hb AS (SELECT
            CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h,
            CAST(max(n_chars) AS BIGINT) AS w
          FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
        ska AS (SELECT h, w FROM ha ORDER BY h LIMIT 256),
        skb AS (SELECT h, w FROM hb ORDER BY h LIMIT 256),
        u AS (SELECT DISTINCT h FROM (SELECT h FROM ska UNION ALL
                                      SELECT h FROM skb)
              ORDER BY h LIMIT 256),
        fl AS (SELECT u.h, a.w AS wa, b.w AS wb
               FROM u LEFT JOIN ska a ON a.h = u.h
               LEFT JOIN skb b ON b.h = u.h),
        agg AS (SELECT CAST(count(*) AS BIGINT) AS union_k,
            CAST(sum(CASE WHEN wa IS NOT NULL AND wb IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS matches,
            CAST(sum(CASE WHEN wa IS NOT NULL AND wb IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS only_a,
            CAST(sum(CASE WHEN wb IS NOT NULL AND wa IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS only_b,
            CAST(sum(CASE WHEN wa IS NOT NULL AND wb IS NOT NULL
                     THEN greatest(COALESCE(wa,0), COALESCE(wb,0))
                     ELSE 0 END) AS BIGINT) AS w_matched,
            CAST(sum(CASE WHEN wa IS NOT NULL AND wb IS NULL
                     THEN wa ELSE 0 END) AS BIGINT) AS w_only_a,
            CAST(sum(CASE WHEN wb IS NOT NULL AND wa IS NULL
                     THEN wb ELSE 0 END) AS BIGINT) AS w_only_b,
            max(h) AS kth FROM fl),
        est AS (SELECT union_k, matches, only_a, only_b,
            w_matched, w_only_a, w_only_b,
            CASE WHEN union_k < 256 THEN union_k
                 ELSE CAST(FLOOR(255.0 * 1152921504606846976.0
                                 / CAST(kth AS DOUBLE)) AS BIGINT)
            END AS est_union
          FROM agg)
        SELECT union_k, matches, only_a, only_b,
          w_matched, w_only_a, w_only_b, est_union,
          CAST(est_union * w_matched // union_k AS BIGINT)
            AS est_w_intersection,
          CAST(est_union * w_only_a // union_k AS BIGINT)
            AS est_w_a_minus_b,
          CAST(est_union * w_only_b // union_k AS BIGINT)
            AS est_w_b_minus_a
        FROM est""")),

    // WEIGHTED JACCARD over weighted KMV sketches — "how similar are
    // two crawls BY BYTES": Σmin(w)/Σmax(w) over the union support as a
    // ppm ratio whose HT scale factors cancel. ONE row gates BOTH
    // branches: k=1024 holds every distinct text at sf0.01 (union below
    // k → the ppm is EXACT — the judge-requested exact-branch anchor)
    // and k=64 exercises the combined-bottom-k estimator, both
    // recomputed by the oracle from the same bottom-k definition.
    "q_kmv_wjaccard" -> Q(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        def wj(k: Int) = graft.operators.Profile.kmvWeightedJaccard(
          graft.operators.Profile.kmvSketchWeighted(
            docs.filter(col("doc_id") % 3 =!= 0), col("text"),
            col("n_chars"), k),
          graft.operators.Profile.kmvSketchWeighted(
            docs.filter(col("doc_id") % 2 === 0), col("text"),
            col("n_chars"), k), k)
        wj(1024).withColumn("k", lit(1024))
          .unionByName(wj(64).withColumn("k", lit(64)))
      },
      Some {
        def block(k: Int): String = s"""
        ha$k AS (SELECT
            CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h,
            CAST(max(n_chars) AS BIGINT) AS w
          FROM documents WHERE doc_id % 3 <> 0 GROUP BY 1),
        hb$k AS (SELECT
            CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h,
            CAST(max(n_chars) AS BIGINT) AS w
          FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
        ska$k AS (SELECT h, w FROM ha$k ORDER BY h LIMIT $k),
        skb$k AS (SELECT h, w FROM hb$k ORDER BY h LIMIT $k),
        u$k AS (SELECT DISTINCT h FROM (SELECT h FROM ska$k UNION ALL
                                        SELECT h FROM skb$k)
                ORDER BY h LIMIT $k),
        fl$k AS (SELECT u$k.h, a.w AS wa, b.w AS wb
                 FROM u$k LEFT JOIN ska$k a ON a.h = u$k.h
                 LEFT JOIN skb$k b ON b.h = u$k.h),
        agg$k AS (SELECT CAST(count(*) AS BIGINT) AS union_k,
            CAST(sum(CASE WHEN wa IS NOT NULL AND wb IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS matches,
            CAST(sum(least(COALESCE(wa,0), COALESCE(wb,0))) AS BIGINT)
              AS w_min_sum,
            CAST(sum(greatest(COALESCE(wa,0), COALESCE(wb,0))) AS BIGINT)
              AS w_max_sum,
            max(h) AS kth FROM fl$k),
        est$k AS (SELECT union_k, matches, w_min_sum, w_max_sum,
            CASE WHEN w_max_sum = 0 THEN CAST(0 AS BIGINT)
                 ELSE CAST(CAST(w_min_sum AS HUGEINT) * 1000000
                           // w_max_sum AS BIGINT) END AS wjaccard_ppm,
            CASE WHEN union_k < $k THEN union_k
                 ELSE CAST(FLOOR(${k - 1}.0 * 1152921504606846976.0
                                 / CAST(kth AS DOUBLE)) AS BIGINT)
            END AS est_union
          FROM agg$k),
        out$k AS (SELECT union_k, matches, w_min_sum, w_max_sum,
            wjaccard_ppm, est_union,
            CAST(CAST(est_union AS HUGEINT) * w_min_sum
                 // union_k AS BIGINT) AS est_w_min,
            CAST(CAST(est_union AS HUGEINT) * w_max_sum
                 // union_k AS BIGINT) AS est_w_max,
            CAST($k AS INT) AS k FROM est$k)"""
        s"""
        WITH ${block(1024)}, ${block(64)}
        SELECT * FROM out1024 UNION ALL SELECT * FROM out64"""
      }),

    // KMV overlap MATRIX — corpus-fleet governance in one row per slice
    // pair: token-VOCABULARY overlap across the five languages (token
    // universes genuinely intersect: numbers, punctuation, shared words),
    // every estimate recomputed by the oracle from the same bottom-k
    // definition. N sketch builds + sketch-sized joins, never N² corpus
    // joins.
    "q_kmv_matrix" -> Q(
      (s, dir) => {
        val toks = table(s, dir, "documents")
          .select(col("lang"), explode(tokens(col("text"))).as("token"))
        val sk = graft.operators.Profile.kmvSketch(
          toks, col("token"), k = 128, sliceCols = Seq("lang"))
        graft.operators.Profile.kmvOverlapMatrix(sk, "lang", k = 128)
      },
      Some(s"""
        WITH tok AS (SELECT lang, unnest($sqlTokens) AS token FROM documents),
        hh AS (SELECT DISTINCT lang,
            CAST(('0x' || substring(md5(token), 1, 15)) AS BIGINT) AS h
          FROM tok),
        sk AS (SELECT lang, h FROM (SELECT lang, h,
            row_number() OVER (PARTITION BY lang ORDER BY h) AS rn FROM hh)
          WHERE rn <= 128),
        langs AS (SELECT DISTINCT lang FROM sk),
        pairs AS (SELECT a.lang AS la, b.lang AS lb
          FROM langs a JOIN langs b ON a.lang < b.lang),
        uni AS (SELECT DISTINCT p.la, p.lb, s.h
          FROM pairs p JOIN sk s ON s.lang = p.la OR s.lang = p.lb),
        u AS (SELECT la, lb, h FROM (SELECT la, lb, h,
            row_number() OVER (PARTITION BY la, lb ORDER BY h) AS rn FROM uni)
          WHERE rn <= 128),
        fl AS (SELECT u.la, u.lb, u.h,
            (sa.h IS NOT NULL AND sb.h IS NOT NULL) AS b2
          FROM u
          LEFT JOIN sk sa ON sa.lang = u.la AND sa.h = u.h
          LEFT JOIN sk sb ON sb.lang = u.lb AND sb.h = u.h),
        agg AS (SELECT la AS slice_a, lb AS slice_b,
            CAST(count(*) AS BIGINT) AS union_k,
            CAST(sum(CASE WHEN b2 THEN 1 ELSE 0 END) AS BIGINT) AS matches,
            max(h) AS kth
          FROM fl GROUP BY 1, 2),
        est AS (SELECT slice_a, slice_b, union_k, matches,
            CAST(matches * 1000000 // union_k AS BIGINT) AS jaccard_ppm,
            CASE WHEN union_k < 128 THEN union_k
                 ELSE CAST(FLOOR(127.0 * 1152921504606846976.0
                                 / CAST(kth AS DOUBLE)) AS BIGINT)
            END AS est_union
          FROM agg)
        SELECT slice_a, slice_b, union_k, matches, jaccard_ppm, est_union,
          CAST((est_union // union_k) * matches
               + ((est_union % union_k) * matches) // union_k AS BIGINT)
            AS est_intersection
        FROM est""")),

    // The KMV loop's NOVELTY feed: per micro-batch, history's distinct
    // estimate before/after absorbing the batch and the clamped delta —
    // "how much of today's crawl is actually new". Deterministic given
    // the batch split, so the oracle recomputes every row: per-prefix
    // bottom-k estimates over the same 60-bit hashes.
    "q_kmv_novelty" -> Q(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val base = Queries.tempDir("graft_kmvnov")
        val skPath = s"$base/sk"; val stPath = s"$base/stats"
        (0 until 3).foreach { i =>
          graft.streaming.SketchStreams.processKmvBatch(
            docs.filter(col("doc_id") % 3 === i), i.toLong,
            col("text"), 64, skPath, Nil, Some(stPath))
        }
        s.read.parquet(stPath).select(
          col("__batch_id").cast("long").as("batch_id"),
          col("batch_kept"), col("est_before"), col("est_after"),
          col("est_new"))
      },
      Some("""
        WITH d AS (SELECT DISTINCT doc_id % 3 AS b,
            CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h
          FROM documents),
        pre0 AS (SELECT h FROM (SELECT DISTINCT h FROM d WHERE b <= 0)
                 ORDER BY h LIMIT 64),
        e0 AS (SELECT CAST(count(*) AS BIGINT) AS c, max(h) AS m FROM pre0),
        est0 AS (SELECT CASE WHEN c < 64 THEN c
            ELSE CAST(FLOOR(63.0 * 1152921504606846976.0
                            / CAST(m AS DOUBLE)) AS BIGINT) END AS e FROM e0),
        pre1 AS (SELECT h FROM (SELECT DISTINCT h FROM d WHERE b <= 1)
                 ORDER BY h LIMIT 64),
        e1 AS (SELECT CAST(count(*) AS BIGINT) AS c, max(h) AS m FROM pre1),
        est1 AS (SELECT CASE WHEN c < 64 THEN c
            ELSE CAST(FLOOR(63.0 * 1152921504606846976.0
                            / CAST(m AS DOUBLE)) AS BIGINT) END AS e FROM e1),
        pre2 AS (SELECT h FROM (SELECT DISTINCT h FROM d WHERE b <= 2)
                 ORDER BY h LIMIT 64),
        e2 AS (SELECT CAST(count(*) AS BIGINT) AS c, max(h) AS m FROM pre2),
        est2 AS (SELECT CASE WHEN c < 64 THEN c
            ELSE CAST(FLOOR(63.0 * 1152921504606846976.0
                            / CAST(m AS DOUBLE)) AS BIGINT) END AS e FROM e2)
        SELECT CAST(0 AS BIGINT) AS batch_id,
          (SELECT CAST(LEAST(count(DISTINCT h), 64) AS BIGINT) FROM d
             WHERE b = 0) AS batch_kept,
          CAST(0 AS BIGINT) AS est_before,
          (SELECT e FROM est0) AS est_after,
          (SELECT e FROM est0) AS est_new
        UNION ALL
        SELECT CAST(1 AS BIGINT),
          (SELECT CAST(LEAST(count(DISTINCT h), 64) AS BIGINT) FROM d
             WHERE b = 1),
          (SELECT e FROM est0), (SELECT e FROM est1),
          GREATEST(CAST(0 AS BIGINT),
            (SELECT e FROM est1) - (SELECT e FROM est0))
        UNION ALL
        SELECT CAST(2 AS BIGINT),
          (SELECT CAST(LEAST(count(DISTINCT h), 64) AS BIGINT) FROM d
             WHERE b = 2),
          (SELECT e FROM est1), (SELECT e FROM est2),
          GREATEST(CAST(0 AS BIGINT),
            (SELECT e FROM est2) - (SELECT e FROM est1))""")),

    // STREAMING sketch maintenance, gated by the batch rows' own oracles:
    // the corpus arrives as three micro-batch deltas, each batch builds
    // its own bounded sketch partition, and the serve-side merge is EXACT
    // algebra (GROUP-BY-SUM for CMS counters, re-min for KMV) — so the
    // streamed estimates must be bit-equal to the offline rows. q_cms's
    // estimate tail over the served sketch; a mid-stream marker-guarded
    // compaction runs before serving so the row also gates "compaction
    // changes nothing".
    "q_cms_stream" -> Q(
      (s, dir) => {
        val toks = table(s, dir, "documents")
          .withColumn("slice", col("doc_id") % 4)
          .select(col("doc_id"), col("lang"), col("slice"),
            explode(tokens(col("text"))).as("token"))
        val path = Queries.tempDir("graft_cmsstream") + "/sk"
        (0 until 3).foreach { i =>
          graft.streaming.SketchStreams.processCmsBatch(
            toks.filter(col("doc_id") % 3 === i), i.toLong,
            col("token"), 3, 64, path, Seq("lang", "slice"))
        }
        graft.streaming.SketchStreams.compactCms(s, path, uptoBatch = 1L,
          Seq("lang", "slice"))
        val served = graft.streaming.SketchStreams.serveCms(s, path,
          Seq("lang"))
        graft.operators.Profile.cmsEstimate(
          served, Seq("vector", "spark", "customer", "zzz_not_a_token"),
          depth = 3, width = 64, sliceCols = Seq("lang"))
      },
      // identical expected output to q_cms by exact merge algebra
      Some(s"""
        WITH tok AS (SELECT lang, unnest($sqlTokens) AS token FROM documents),
        cms AS (SELECT lang, r.i AS r,
            CAST(('0x' || substring(md5(token || ':' || CAST(r.i AS VARCHAR)), 1, 8)) AS BIGINT) % 64 AS b,
            CAST(count(*) AS BIGINT) AS cnt
          FROM tok CROSS JOIN range(3) r(i) GROUP BY 1, 2, 3),
        probe AS (SELECT p.item, r.i AS r,
            CAST(('0x' || substring(md5(p.item || ':' || CAST(r.i AS VARCHAR)), 1, 8)) AS BIGINT) % 64 AS b
          FROM (SELECT unnest(['vector', 'spark', 'customer', 'zzz_not_a_token']) AS item) p
          CROSS JOIN range(3) r(i)),
        langs AS (SELECT DISTINCT lang FROM cms),
        j AS (SELECT l.lang, pr.item, pr.r, COALESCE(c.cnt, 0) AS cnt
          FROM langs l CROSS JOIN probe pr
          LEFT JOIN cms c ON c.lang = l.lang AND c.r = pr.r AND c.b = pr.b)
        SELECT lang, item, CAST(min(cnt) AS BIGINT) AS est
        FROM j GROUP BY 1, 2""")),

    // The KMV loop's gate: batch deltas re-minned at serve, mid-stream
    // compaction, then the per-lang distinct estimate — must equal
    // q_kmv_distinct's offline answer bit-for-bit.
    "q_kmv_stream" -> Q(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val path = Queries.tempDir("graft_kmvstream") + "/sk"
        (0 until 3).foreach { i =>
          graft.streaming.SketchStreams.processKmvBatch(
            docs.filter(col("doc_id") % 3 === i), i.toLong,
            col("text"), 64, path, Seq("lang"))
        }
        graft.streaming.SketchStreams.compactKmv(s, path, 64,
          uptoBatch = 1L, Seq("lang"))
        val served = graft.streaming.SketchStreams.serveKmv(s, path, 64,
          Seq("lang"))
        graft.operators.Profile.kmvDistinct(served, k = 64, Seq("lang"))
      },
      Some("""
        WITH h AS (SELECT DISTINCT lang,
            CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h
          FROM documents),
        ranked AS (SELECT lang, h,
            row_number() OVER (PARTITION BY lang ORDER BY h) AS rn FROM h),
        agg AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
            max(h) AS kth
          FROM ranked WHERE rn <= 64 GROUP BY 1)
        SELECT lang, n_kept,
          CASE WHEN n_kept < 64 THEN n_kept
               ELSE CAST(FLOOR(63.0 * 1152921504606846976.0
                               / CAST(kth AS DOUBLE)) AS BIGINT)
          END AS est_distinct
        FROM agg""")),

    // CATEGORICAL DRIFT between two corpus slices (the snapshot-over-
    // snapshot monitor): per-category counts, ppm-quantized shares
    // (cnt·1e6 div total — BIGINT end to end, the cleared-denominator
    // discipline) and the absolute share delta; the battery slices the
    // documents table into a doc_id%3 "old crawl" vs the rest and drifts
    // the source mix. Both engines compute identical floored integers —
    // the table is bit-reproducible by construction.
    "q_drift" -> Q(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        graft.operators.Profile.categoricalDrift(
          docs.filter(col("doc_id") % 3 === 0),
          docs.filter(col("doc_id") % 3 =!= 0),
          col("source"))
      },
      Some("""
        WITH a AS (SELECT source AS category, CAST(count(*) AS BIGINT) AS c
                   FROM documents WHERE doc_id % 3 = 0 GROUP BY 1),
        b AS (SELECT source AS category, CAST(count(*) AS BIGINT) AS c
              FROM documents WHERE doc_id % 3 <> 0 GROUP BY 1),
        ta AS (SELECT sum(c) AS t FROM a), tb AS (SELECT sum(c) AS t FROM b)
        SELECT COALESCE(a.category, b.category) AS category,
          COALESCE(a.c, CAST(0 AS BIGINT)) AS cnt_a,
          COALESCE(b.c, CAST(0 AS BIGINT)) AS cnt_b,
          CAST(COALESCE(a.c, 0) * 1000000 // ta.t AS BIGINT) AS share_a_ppm,
          CAST(COALESCE(b.c, 0) * 1000000 // tb.t AS BIGINT) AS share_b_ppm,
          CAST(abs(COALESCE(a.c, 0) * 1000000 // ta.t
                 - COALESCE(b.c, 0) * 1000000 // tb.t) AS BIGINT) AS diff_ppm
        FROM a FULL OUTER JOIN b ON a.category IS NOT DISTINCT FROM b.category
        CROSS JOIN ta CROSS JOIN tb""")),

    // PER-SLICE categorical drift (groupCols): the source-mix drift
    // WITHIN each language — shares normalize per slice, slice and
    // category keys both null-safe. The grouped twin of q_drift.
    "q_drift_by_lang" -> Q(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        graft.operators.Profile.categoricalDrift(
          docs.filter(col("doc_id") % 3 === 0),
          docs.filter(col("doc_id") % 3 =!= 0),
          col("source"), groupCols = Seq("lang"))
      },
      Some("""
        WITH a AS (SELECT lang, source AS category, CAST(count(*) AS BIGINT) AS c
                   FROM documents WHERE doc_id % 3 = 0 GROUP BY 1, 2),
        b AS (SELECT lang, source AS category, CAST(count(*) AS BIGINT) AS c
              FROM documents WHERE doc_id % 3 <> 0 GROUP BY 1, 2),
        ta AS (SELECT lang, CAST(sum(c) AS BIGINT) AS t FROM a GROUP BY 1),
        tb AS (SELECT lang, CAST(sum(c) AS BIGINT) AS t FROM b GROUP BY 1),
        m AS (SELECT COALESCE(a.lang, b.lang) AS lang,
                COALESCE(a.category, b.category) AS category,
                COALESCE(a.c, CAST(0 AS BIGINT)) AS cnt_a,
                COALESCE(b.c, CAST(0 AS BIGINT)) AS cnt_b
              FROM a FULL OUTER JOIN b
                ON a.lang IS NOT DISTINCT FROM b.lang
               AND a.category IS NOT DISTINCT FROM b.category)
        SELECT m.lang, category, cnt_a, cnt_b,
          CAST(CASE WHEN ta.t IS NULL THEN 0 ELSE cnt_a * 1000000 // ta.t END AS BIGINT) AS share_a_ppm,
          CAST(CASE WHEN tb.t IS NULL THEN 0 ELSE cnt_b * 1000000 // tb.t END AS BIGINT) AS share_b_ppm,
          CAST(abs(CASE WHEN ta.t IS NULL THEN 0 ELSE cnt_a * 1000000 // ta.t END
                 - CASE WHEN tb.t IS NULL THEN 0 ELSE cnt_b * 1000000 // tb.t END) AS BIGINT) AS diff_ppm
        FROM m LEFT JOIN ta ON m.lang IS NOT DISTINCT FROM ta.lang
               LEFT JOIN tb ON m.lang IS NOT DISTINCT FROM tb.lang""")),

    // NUMERIC drift: the same monitor for an integer metric column
    // (document length) — slice A's exact equi-depth 8-quantile cut
    // points (distinct-value prefix sums, BIGINT div) bucket BOTH
    // slices, then the categorical machinery drifts the bucket mix.
    // Reference-side cuts are the PSI convention: stable dashboard
    // buckets while the new slice shifts. Both engines compute the same
    // cuts and the same count-of-cuts-below-x bucket, so the table is
    // bit-reproducible.
    "q_drift_numeric" -> Q(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        graft.operators.Profile.numericDrift(
          docs.filter(col("doc_id") % 3 === 0),
          docs.filter(col("doc_id") % 3 =!= 0),
          col("n_chars"), k = 8)
      },
      Some("""
        WITH cnt AS (SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS c
                     FROM documents WHERE doc_id % 3 = 0 AND n_chars IS NOT NULL
                     GROUP BY 1),
        tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cnt),
        cum AS (SELECT v, CAST(COALESCE(sum(c) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS bef
                FROM cnt),
        bkt AS (SELECT v, LEAST(bef * 8 // n, 7) AS bk FROM cum CROSS JOIN tot),
        cuts AS (SELECT bk, CAST(max(v) AS BIGINT) AS cut FROM bkt
                 WHERE bk < 7 GROUP BY bk),
        cutl AS (SELECT COALESCE(list(cut ORDER BY cut), []) AS cl FROM cuts),
        ab AS (SELECT CASE WHEN n_chars IS NULL THEN NULL
                 ELSE CAST(len(list_filter(cl, e -> e < n_chars)) AS BIGINT) END AS bucket
               FROM documents CROSS JOIN cutl WHERE doc_id % 3 = 0),
        bb AS (SELECT CASE WHEN n_chars IS NULL THEN NULL
                 ELSE CAST(len(list_filter(cl, e -> e < n_chars)) AS BIGINT) END AS bucket
               FROM documents CROSS JOIN cutl WHERE doc_id % 3 <> 0),
        a2 AS (SELECT bucket, CAST(count(*) AS BIGINT) AS c FROM ab GROUP BY 1),
        b2 AS (SELECT bucket, CAST(count(*) AS BIGINT) AS c FROM bb GROUP BY 1),
        ta AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM a2),
        tb AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM b2)
        SELECT COALESCE(a2.bucket, b2.bucket) AS bucket,
          COALESCE(a2.c, CAST(0 AS BIGINT)) AS cnt_a,
          COALESCE(b2.c, CAST(0 AS BIGINT)) AS cnt_b,
          CAST(COALESCE(a2.c, 0) * 1000000 // ta.t AS BIGINT) AS share_a_ppm,
          CAST(COALESCE(b2.c, 0) * 1000000 // tb.t AS BIGINT) AS share_b_ppm,
          CAST(abs(COALESCE(a2.c, 0) * 1000000 // ta.t
                 - COALESCE(b2.c, 0) * 1000000 // tb.t) AS BIGINT) AS diff_ppm
        FROM a2 FULL OUTER JOIN b2 ON a2.bucket IS NOT DISTINCT FROM b2.bucket
        CROSS JOIN ta CROSS JOIN tb""")),

    // EMBEDDING-SPACE drift: per-label centroid shift between the even
    // and odd halves of the embedding corpus — the drift family's vector
    // member. Exact quantized-integer centroids (sum div n truncates the
    // same way in Spark `div` and DuckDB `//`), so cos2_ppm/cos_sign/
    // dist2 must match bit-for-bit.
    "q_drift_embed" -> Q(
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        graft.operators.Profile.embeddingDrift(
          emb.filter(col("vec_id") % 2 === 0),
          emb.filter(col("vec_id") % 2 =!= 0),
          col("embedding"), Seq("label"))
      },
      Some("""
        WITH e AS (SELECT vec_id, label,
            list_transform(embedding,
              x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qe
          FROM embeddings),
        xa AS (SELECT label, unnest(qe) AS q,
            unnest(range(1, len(qe) + 1)) AS pos FROM e WHERE vec_id % 2 = 0),
        xb AS (SELECT label, unnest(qe) AS q,
            unnest(range(1, len(qe) + 1)) AS pos FROM e WHERE vec_id % 2 <> 0),
        sa AS (SELECT label, pos, CAST(sum(q) AS BIGINT) AS s,
            CAST(count(*) AS BIGINT) AS n FROM xa GROUP BY 1, 2),
        sb AS (SELECT label, pos, CAST(sum(q) AS BIGINT) AS s,
            CAST(count(*) AS BIGINT) AS n FROM xb GROUP BY 1, 2),
        ma AS (SELECT label, pos, s // n AS m FROM sa),
        mb AS (SELECT label, pos, s // n AS m FROM sb),
        met AS (SELECT ma.label,
            CAST(sum(ma.m * mb.m) AS BIGINT) AS dot,
            CAST(sum(ma.m * ma.m) AS BIGINT) AS na2,
            CAST(sum(mb.m * mb.m) AS BIGINT) AS nb2,
            CAST(sum((ma.m - mb.m) * (ma.m - mb.m)) AS BIGINT) AS dist2
          FROM ma JOIN mb ON ma.label = mb.label AND ma.pos = mb.pos
          GROUP BY 1),
        cta AS (SELECT label, max(n) AS n_a FROM sa GROUP BY 1),
        ctb AS (SELECT label, max(n) AS n_b FROM sb GROUP BY 1)
        SELECT COALESCE(cta.label, ctb.label) AS label, n_a, n_b,
          CASE WHEN na2 = 0 OR nb2 = 0 THEN NULL
               ELSE CAST((CAST(dot AS HUGEINT) * dot * 1000000)
                         // (CAST(na2 AS HUGEINT) * nb2) AS BIGINT) END
            AS cos2_ppm,
          CAST(CASE WHEN dot > 0 THEN 1 WHEN dot < 0 THEN -1
               WHEN dot IS NULL THEN NULL ELSE 0 END AS INT) AS cos_sign,
          dist2
        FROM cta FULL OUTER JOIN ctb ON cta.label = ctb.label
        LEFT JOIN met ON met.label = COALESCE(cta.label, ctb.label)""")),

    // Embedding drift behind SQL — shares q_drift_embed's oracle (the
    // TVF splices the same plan).
    "q_sql_tvf_drift_embed" -> Q(
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val emb = table(s, dir, "embeddings")
        emb.filter(col("vec_id") % 2 === 0)
          .createOrReplaceTempView("emb_drift_a_v")
        emb.filter(col("vec_id") % 2 =!= 0)
          .createOrReplaceTempView("emb_drift_b_v")
        s.sql("SELECT * FROM graft_drift_embed('emb_drift_a_v', " +
          "'emb_drift_b_v', 'embedding', 'label')")
      },
      Some("""
        WITH e AS (SELECT vec_id, label,
            list_transform(embedding,
              x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qe
          FROM embeddings),
        xa AS (SELECT label, unnest(qe) AS q,
            unnest(range(1, len(qe) + 1)) AS pos FROM e WHERE vec_id % 2 = 0),
        xb AS (SELECT label, unnest(qe) AS q,
            unnest(range(1, len(qe) + 1)) AS pos FROM e WHERE vec_id % 2 <> 0),
        sa AS (SELECT label, pos, CAST(sum(q) AS BIGINT) AS s,
            CAST(count(*) AS BIGINT) AS n FROM xa GROUP BY 1, 2),
        sb AS (SELECT label, pos, CAST(sum(q) AS BIGINT) AS s,
            CAST(count(*) AS BIGINT) AS n FROM xb GROUP BY 1, 2),
        ma AS (SELECT label, pos, s // n AS m FROM sa),
        mb AS (SELECT label, pos, s // n AS m FROM sb),
        met AS (SELECT ma.label,
            CAST(sum(ma.m * mb.m) AS BIGINT) AS dot,
            CAST(sum(ma.m * ma.m) AS BIGINT) AS na2,
            CAST(sum(mb.m * mb.m) AS BIGINT) AS nb2,
            CAST(sum((ma.m - mb.m) * (ma.m - mb.m)) AS BIGINT) AS dist2
          FROM ma JOIN mb ON ma.label = mb.label AND ma.pos = mb.pos
          GROUP BY 1),
        cta AS (SELECT label, max(n) AS n_a FROM sa GROUP BY 1),
        ctb AS (SELECT label, max(n) AS n_b FROM sb GROUP BY 1)
        SELECT COALESCE(cta.label, ctb.label) AS label, n_a, n_b,
          CASE WHEN na2 = 0 OR nb2 = 0 THEN NULL
               ELSE CAST((CAST(dot AS HUGEINT) * dot * 1000000)
                         // (CAST(na2 AS HUGEINT) * nb2) AS BIGINT) END
            AS cos2_ppm,
          CAST(CASE WHEN dot > 0 THEN 1 WHEN dot < 0 THEN -1
               WHEN dot IS NULL THEN NULL ELSE 0 END AS INT) AS cos_sign,
          dist2
        FROM cta FULL OUTER JOIN ctb ON cta.label = ctb.label
        LEFT JOIN met ON met.label = COALESCE(cta.label, ctb.label)""")),

    // STREAMING EMBEDDING-DRIFT MONITOR: the odd half of the corpus
    // arrives as three micro-batches, each landing its per-label centroid
    // shift vs the CONSTANT even-half reference under __batch_id (plus a
    // batch-1 retry — the dynamic-overwrite idempotence contract, gated
    // by row counts). The oracle recomputes every batch's drift with the
    // q_drift_embed arithmetic.
    "q_drift_embed_stream" -> Q(
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        val reference = emb.filter(col("vec_id") % 2 === 0)
        val statsPath = Queries.tempDir("graft_driftstream") + "/stats"
        def batchOf(i: Int) = emb.filter(
          col("vec_id") % 2 =!= 0 && col("vec_id") % 3 === i)
        (0 until 3).foreach { i =>
          graft.streaming.EmbeddingStreams.processDriftBatch(
            batchOf(i), i.toLong, reference, "embedding", Seq("label"),
            statsPath)
        }
        // the retry: same batch content, same id — must rewrite, not add
        graft.streaming.EmbeddingStreams.processDriftBatch(
          batchOf(1), 1L, reference, "embedding", Seq("label"), statsPath)
        s.read.parquet(statsPath).select(col("label"), col("n_a"),
          col("n_b"), col("cos2_ppm"), col("cos_sign"), col("dist2"),
          col("__batch_id").cast("long").as("batch_id"))
      },
      Some((0 until 3).map(embedDriftBatchOracle).mkString(
        "", " UNION ALL ", ""))),

    // DRIFT ALARM with DEBOUNCE (round-18, the "when does the monitor
    // actually page" composition): the same 3-batch drift protocol, then
    // Profile.driftAlarm over the landed stats — breach = dist2 ≥ 18e6,
    // alarm only after 2 CONSECUTIVE breaching batches. At sf0.01 the
    // fixture exercises every debounce case: sustained breach (alarms
    // from batch 1 on), single spike (never alarms), breach-gap-breach
    // (counter resets — no alarm). Oracle: the same per-batch drift
    // arithmetic + the identical window in DuckDB; dist2 is exact
    // integer on both engines, so the breach decisions are bit-equal.
    "q_drift_alarm" -> Q(
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        val reference = emb.filter(col("vec_id") % 2 === 0)
        val statsPath = Queries.tempDir("graft_driftalarm") + "/stats"
        (0 until 3).foreach { i =>
          graft.streaming.EmbeddingStreams.processDriftBatch(
            emb.filter(col("vec_id") % 2 =!= 0 && col("vec_id") % 3 === i),
            i.toLong, reference, "embedding", Seq("label"), statsPath)
        }
        graft.operators.Profile.driftAlarm(
          s.read.parquet(statsPath), Seq("label"), col("__batch_id"),
          breach = col("dist2") >= lit(18000000L), consecutive = 2)
      },
      Some(s"""
        WITH stats AS (${(0 until 3).map(embedDriftBatchOracle)
          .mkString("", " UNION ALL ", "")}),
        b AS (SELECT label, batch_id,
            CASE WHEN dist2 >= 18000000 THEN 1 ELSE 0 END AS breached
          FROM stats)
        SELECT label, batch_id, breached,
          CAST(CASE WHEN sum(breached) OVER (PARTITION BY label
                 ORDER BY batch_id ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) = 2
               AND count(*) OVER (PARTITION BY label
                 ORDER BY batch_id ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) = 2
               THEN 1 ELSE 0 END AS INT) AS alarm
        FROM b""")),

    // ORDERED-SHARD EXPORT invariants: shards written, read back, and
    // checked — every row present exactly once, and the shard key-ranges
    // pairwise disjoint in shard order (the contiguous-global-order
    // contract a trainer streaming shard 0,1,2… relies on). Per-shard
    // row counts are boundary-sample-dependent, so the row asserts the
    // deterministic invariants rather than the manifest itself.
    "q_shard_export" -> Q(
      (s, dir) => {
        val docs = table(s, dir, "documents").select("doc_id", "lang", "text")
        val path = graft.operators.IndexRoot.path(s, "shards", s"$dir|doc_id|8")
        graft.operators.Lake.writeOrderedShards(
          docs, path, Seq(col("doc_id")), numShards = 8)
        val back = s.read.parquet(path)
        val perShard = back.groupBy("shard")
          .agg(min("doc_id").as("mn"), max("doc_id").as("mx"))
        val overlaps = perShard.alias("x")
          .join(perShard.alias("y"),
            expr("x.shard < y.shard AND x.mx >= y.mn"))
          .agg(count(lit(1)).as("n_overlaps"))
        back.agg(count(lit(1)).as("total_rows"),
            countDistinct(col("doc_id")).as("n_docs"))
          .crossJoin(overlaps)
          .select(col("total_rows"), col("n_docs"),
            (col("n_overlaps") === 0).cast("int").as("ranges_ok"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS total_rows,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(1 AS INT) AS ranges_ok
             FROM documents""")),

    // JSONL SHARD EXPORT with EXACT membership (the format trainers
    // actually stream): writeJsonlShardsRanked cuts balanced contiguous
    // shards by GLOBAL RANK (shard = rank·S div n — a pure function of
    // the data, unlike repartitionByRange's run-seeded boundary samples),
    // so the oracle recomputes every row's shard with plain row_number
    // arithmetic. The gate reads the written JSONL back: membership,
    // and text length per doc (JSON escaping round-trip), exact; the
    // shard → count manifest is asserted against the read-back inside
    // the row.
    "q_jsonl_export" -> Q(
      (s, dir) => {
        val docs = table(s, dir, "documents").select("doc_id", "lang", "text")
        val path = Queries.tempDir("graft_jsonl") + "/shards"
        val manifest = graft.operators.Lake.writeJsonlShardsRanked(
          docs, path, Seq(col("doc_id")), numShards = 8)
        val back = s.read
          .schema(org.apache.spark.sql.types.StructType(
            docs.schema.fields :+
              org.apache.spark.sql.types.StructField("shard",
                org.apache.spark.sql.types.LongType)))
          .option("basePath", path).json(path)
        // manifest == files: the returned counts must equal what a reader
        // sees (a manifest that drifts from the shards is worse than none)
        val m = manifest.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val fromFiles = back.groupBy("shard").count().collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        require(m == fromFiles,
          s"jsonl manifest/file mismatch: manifest=$m files=$fromFiles")
        back.select(col("doc_id"), col("shard"), col("lang"),
          length(col("text")).cast("long").as("text_len"))
      },
      Some("""
        WITH n AS (SELECT count(*) AS c FROM documents)
        SELECT doc_id,
          CAST((row_number() OVER (ORDER BY doc_id) - 1) * 8 // (SELECT c FROM n) AS BIGINT) AS shard,
          lang, CAST(length(text) AS BIGINT) AS text_len
        FROM documents""")),

    // SEEDED SHUFFLE-SHARD EXPORT: the corpus written in a keyed
    // pseudo-random permutation (md5(seed:id) order, reproducible on any
    // engine). The gate is EXACT: the rank of every document in the
    // WRITTEN layout (shard asc, then in-shard key order) must equal the
    // oracle's independent row_number over its own md5 ordering — i.e.
    // the files on disk really are the seed's permutation, range
    // boundaries included.
    "q_shuffle_export" -> Q(
      (s, dir) => {
        val docs = table(s, dir, "documents").select("doc_id", "text")
        val path = graft.operators.IndexRoot.path(s, "shuffle", s"$dir|7|8")
        graft.operators.Lake.writeShuffledShards(docs, path, "doc_id",
          seed = 7L, numShards = 8)
        // global rank is the ORACLE-COMPARISON projection, not the export
        // operator (which never global-sorts); constant partition key makes
        // the single-partition intent explicit and keeps Spark's "no
        // partition defined" WARN out of the bench log (Chunking.scala has
        // the same pattern over bucket sums)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(lit(0))
          .orderBy(col("shard"), col("__shuffle_key"), col("doc_id"))
        s.read.parquet(path)
          .select(col("doc_id"), row_number().over(w).cast("long").as("rank"))
      },
      Some("""SELECT doc_id,
               CAST(row_number() OVER (
                 ORDER BY md5('7:' || CAST(doc_id AS VARCHAR)), doc_id)
                 AS BIGINT) AS rank
             FROM documents""")),

    // STREAMING CDC MERGE LOOP, two micro-batches deep: batch 1 loads the
    // full key set at version 1; batch 2 upserts (%5=0, value shift) and
    // tombstones (%10=0) at version 2. The surviving live view must be
    // the last-write-wins state the oracle computes directly. Re-running
    // the battery re-merges onto the previous final snapshot — a no-op by
    // the argmax merge's idempotence, so the row is rerun-stable.
    "q_cdc_merge_loop" -> Q(
      (s, dir) => {
        val path = graft.operators.IndexRoot.path(s, "cdcloop", s"$dir|orders")
        val base = table(s, dir, "orders").select(
          col("o_orderkey"), col("o_orderstatus"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        val b1 = base.withColumn("v", lit(1L)).withColumn("del", lit(false))
        val b2 = base.filter(col("o_orderkey") % 5 === 0)
          .withColumn("cents", col("cents") + 100L)
          .withColumn("v", lit(2L))
          .withColumn("del", col("o_orderkey") % 10 === 0)
        graft.streaming.ChangeStreams.mergeBatch(
          b1, Seq("o_orderkey"), Seq("v"), col("del"), path)
        graft.streaming.ChangeStreams.mergeBatch(
          b2, Seq("o_orderkey"), Seq("v"), col("del"), path)
        graft.streaming.ChangeStreams.readSnapshot(s, path)
          .select("o_orderkey", "o_orderstatus", "cents", "v")
      },
      Some(cdcMergeOracleSql)),

    // The SAME two-cycle merge through the PARTITIONED copy-on-write
    // layout (snapshot laid out by a pure key function; each batch reads
    // and rewrites ONLY its touched partitions via dynamic partition
    // overwrite — the O(batch + touched partitions) regime the 10× sweep
    // showed the full rewrite lacks). Same oracle: the layout must be
    // invisible in the merged state.
    "q_cdc_merge_part" -> Q(
      (s, dir) => {
        val path = graft.operators.IndexRoot.path(s, "cdcpart", s"$dir|orders")
        val base = table(s, dir, "orders").select(
          col("o_orderkey"), col("o_orderstatus"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        val b1 = base.withColumn("v", lit(1L)).withColumn("del", lit(false))
        val b2 = base.filter(col("o_orderkey") % 5 === 0)
          .withColumn("cents", col("cents") + 100L)
          .withColumn("v", lit(2L))
          .withColumn("del", col("o_orderkey") % 10 === 0)
        // pmod 5 on purpose: batch 2 updates keys ≡ 0 (mod 5), so the
        // second merge touches exactly ONE of the five partitions — the
        // battery row exercises the pruned-read/pruned-rewrite path, not
        // just the layout
        val part = Some(("okpart", pmod(col("o_orderkey"), lit(5L))))
        graft.streaming.ChangeStreams.mergeBatch(
          b1, Seq("o_orderkey"), Seq("v"), col("del"), path,
          snapshotPartition = part)
        graft.streaming.ChangeStreams.mergeBatch(
          b2, Seq("o_orderkey"), Seq("v"), col("del"), path,
          snapshotPartition = part)
        graft.streaming.ChangeStreams.readSnapshot(s, path, Some("okpart"))
          .select("o_orderkey", "o_orderstatus", "cents", "v")
      },
      Some(cdcMergeOracleSql)),

    // CHANGE-DATA FEED — the per-batch net live-view effect the CDC
    // merge appends for downstream incremental consumers, previously
    // spec-only (ChangeStreamsSpec): the SAME two-cycle merge as
    // q_cdc_merge_loop but gating the FEED, preimages included —
    // batch 1 bootstraps (all inserts, nothing to retract), batch 2
    // nets out to updates (+100 cents, v 1→2 with the replaced row in
    // _before) and deletes (old values carried). Fresh session-scoped
    // dirs per call: a feed is append-only, so reusing a cross-run
    // IndexRoot path would make the row's output depend on history.
    "q_change_feed" -> Q(
      (s, dir) => {
        val base0 = Queries.tempDir("graft_changefeed")
        val snapPath = s"$base0/snap"; val feedPath = s"$base0/feed"
        val base = table(s, dir, "orders").select(
          col("o_orderkey"), col("o_orderstatus"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        val b1 = base.withColumn("v", lit(1L)).withColumn("del", lit(false))
        val b2 = base.filter(col("o_orderkey") % 5 === 0)
          .withColumn("cents", col("cents") + 100L)
          .withColumn("v", lit(2L))
          .withColumn("del", col("o_orderkey") % 10 === 0)
        graft.streaming.ChangeStreams.mergeBatch(
          b1, Seq("o_orderkey"), Seq("v"), col("del"), snapPath,
          changeFeedPath = Some(feedPath), batchId = 1L)
        graft.streaming.ChangeStreams.mergeBatch(
          b2, Seq("o_orderkey"), Seq("v"), col("del"), snapPath,
          changeFeedPath = Some(feedPath), batchId = 2L)
        s.read.parquet(feedPath).select(
          col("o_orderkey"), col("_op"), col("cents"), col("v"),
          col("_before.cents").as("before_cents"),
          col("_before.v").as("before_v"),
          col("__batch_id").cast("long").as("__batch_id"))
      },
      Some("""
        WITH base AS (SELECT o_orderkey,
            CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
        SELECT o_orderkey, 'insert' AS _op, cents, CAST(1 AS BIGINT) AS v,
          CAST(NULL AS BIGINT) AS before_cents,
          CAST(NULL AS BIGINT) AS before_v,
          CAST(1 AS BIGINT) AS __batch_id FROM base
        UNION ALL
        SELECT o_orderkey, 'update', cents + 100, 2, cents, 1, 2 FROM base
        WHERE o_orderkey % 5 = 0 AND o_orderkey % 10 <> 0
        UNION ALL
        SELECT o_orderkey, 'delete', cents, 1, cents, 1, 2 FROM base
        WHERE o_orderkey % 10 = 0""")),

    // SNAPSHOT-DIFF PREIMAGES — diffSnapshots(includeBefore): updates
    // and deletes carry the REPLACED row (the Delta-CDF preimage shape a
    // downstream incremental aggregate retracts), inserts carry NULLs.
    // Previously spec-only (LakeSpec); the oracle replays the full-outer
    // struct-compare with before-values as plain CASE columns.
    "q_snapshot_preimage" -> Q(
      (s, dir) => {
        val base = table(s, dir, "orders").select(
          col("o_orderkey"), col("o_orderstatus").as("st"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        val oldSnap = base
        val newSnap = base.filter(col("o_orderkey") % 7 =!= 0)
          .withColumn("cents", when(col("o_orderkey") % 5 === 0,
            col("cents") + 50L).otherwise(col("cents")))
          .unionByName(base.filter(col("o_orderkey") % 11 === 0)
            .select((-col("o_orderkey")).as("o_orderkey"), col("st"),
              (col("cents") + 7L).as("cents")))
        graft.operators.Lake.diffSnapshots(oldSnap, newSnap,
            Seq("o_orderkey"), includeBefore = true)
          .select(col("o_orderkey"), col("op"), col("st"), col("cents"),
            col("_before.st").as("before_st"),
            col("_before.cents").as("before_cents"))
      },
      Some("""
        WITH base AS (SELECT o_orderkey, o_orderstatus AS st,
            CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        newv AS (SELECT o_orderkey, st,
            CASE WHEN o_orderkey % 5 = 0 THEN cents + 50 ELSE cents END AS cents
          FROM base WHERE o_orderkey % 7 <> 0
          UNION ALL
          SELECT -o_orderkey, st, cents + 7 FROM base
          WHERE o_orderkey % 11 = 0)
        SELECT * FROM (
          SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
            CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                 WHEN n.o_orderkey IS NULL THEN 'delete'
                 WHEN NOT (o.st IS NOT DISTINCT FROM n.st
                       AND o.cents IS NOT DISTINCT FROM n.cents)
                   THEN 'update' END AS op,
            CASE WHEN n.o_orderkey IS NULL THEN o.st ELSE n.st END AS st,
            CASE WHEN n.o_orderkey IS NULL THEN o.cents
                 ELSE n.cents END AS cents,
            CASE WHEN o.o_orderkey IS NULL THEN NULL ELSE o.st END
              AS before_st,
            CASE WHEN o.o_orderkey IS NULL THEN NULL ELSE o.cents END
              AS before_cents
          FROM base o FULL OUTER JOIN newv n
            ON o.o_orderkey = n.o_orderkey) d
        WHERE op IS NOT NULL""")),

    // STREAMING LAKE SINK + REPLAY — the toPartitionedParquet /
    // fromPartitionedParquet pair, previously spec-only
    // (EventStreamsSpec): three fixed batches land date+batch
    // partitioned, then batch 1 is RETRIED — the dynamic-partition
    // overwrite must rewrite its own partitions, not append a second
    // copy (the r15 append sink failed exactly this; row counts gate
    // it). Output = the landed lake read back whole, every projected
    // column recomputable by the oracle from `events` alone.
    "q_lake_sink_replay" -> Q(
      (s, dir) => {
        val lakePath = Queries.tempDir("graft_lakesink") + "/lake"
        val ev = events(s, dir)
          .select("event_id", "ts", "user_id", "event_type", "value")
        (0 until 3).foreach { i =>
          graft.streaming.EventStreams.processLakeBatch(
            ev.filter(col("event_id") % 3 === i), i.toLong, lakePath)
        }
        // the retry: identical content, same batch id — idempotent
        graft.streaming.EventStreams.processLakeBatch(
          ev.filter(col("event_id") % 3 === 1), 1L, lakePath)
        s.read.parquet(lakePath).select(
          col("event_id"), col("user_id"), col("event_type"),
          round(col("value") * 100).cast("long").as("cents"),
          col("event_date").cast("string").as("event_date"),
          col("__batch_id").cast("long").as("__batch_id"))
      },
      Some("""
        SELECT event_id, user_id, event_type,
          CAST(round(value * 100) AS BIGINT) AS cents,
          CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date,
          CAST(event_id % 3 AS BIGINT) AS __batch_id
        FROM events""")),
  )
}
