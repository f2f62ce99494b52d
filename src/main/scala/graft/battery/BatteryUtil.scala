package graft

import graft.functions.TextFunctions._
import graft.operators.{Dedup, Multimodal, Similarity}
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._

/** Shared helpers of the extension battery: golden-fixture
  * oracles, DuckDB CTE builders, and the stream-loop runners
  * the family files under graft/battery/ compose. Split out
  * of ExtQueries.scala (round 19) with no behavior change.
  */
private[graft] object BatteryUtil {
  import Queries.{Q, table, events}



  // DuckDB mirror of TextFunctions.tokens
  private[graft] val sqlTokens =
    raw"list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0)"


  // the PII patterns are RE2-compatible by construction (TextFunctions),
  // so the same strings drop into DuckDB SQL literals verbatim
  private[graft] val sqlEmailPattern = graft.functions.TextFunctions.emailPattern

  private[graft] val sqlUrlPattern = graft.functions.TextFunctions.urlPattern

  private[graft] val sqlPhonePattern = graft.functions.TextFunctions.phonePattern


  /** Golden-fixture oracle: an INDEPENDENT single-node brute-force
    * recomputation of a deterministic operator over the sf0.01 corpus
    * (see [[graft.tools.GoldenGen]] in test sources), committed as parquet
    * and SELECTed directly by the DuckDB gate. Anchors the operators whose
    * logic (rolling hashes, banded signatures) plain SQL cannot express.
    */
  private[graft] def golden(name: String): Option[String] =
    Some(s"SELECT * FROM read_parquet('/root/repo/src/test/resources/golden/$name/*.parquet')")


  // Raw-string-gram contamination oracle, shared by the exact and
  // Bloom-pushdown battery rows (identical expected output by design).
  private[graft] val decontaminateOracleSql: String = {
    val gram = (1 to 7).foldLeft("toks[i]") { (acc, k) => s"$acc || ' ' || toks[i+$k]" }
    s"""
        WITH tk AS (SELECT doc_id, $sqlTokens AS toks FROM documents),
        g AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 6),
                i -> $gram)) AS gs
              FROM tk WHERE len(toks) >= 8),
        bench AS (SELECT DISTINCT unnest(gs) AS gr FROM g WHERE doc_id % 10 = 0),
        dg AS (SELECT doc_id, unnest(gs) AS gr FROM g WHERE doc_id % 10 <> 0)
        SELECT doc_id AS id, CAST(count(*) AS BIGINT) AS n_hits
        FROM dg JOIN bench USING (gr) GROUP BY 1"""
  }


  /** The SHARED MinHash index of the documents corpus (battery params:
    * shingle 3, 128 hashes, 32 bands): built once per JVM and re-read from
    * its parquet layout, so the four pair pipelines below (pairs, greedy
    * drop, clustering, incremental) consume one signature pass — the
    * nightly-index-job shape — instead of re-tokenizing the corpus per
    * query.
    */
  private[graft] def docsMinhashIdx(s: org.apache.spark.sql.SparkSession, dir: String) =
    Dedup.minhashIndexFor(table(s, dir, "documents"),
      cacheKey = s"$dir/documents!minhash!3!128!32",
      "doc_id", "text", shingleSize = 3, numHashes = 128, bands = 32)


  /** The battery's curation config (both pipeline rows share it). */
  private[graft] val curationCfg = graft.operators.Curation.Config(
    keepLangs = Set("en"), minQuality = 0.3, nearDupThreshold = 0.5,
    chunkTokens = 40, chunkStride = 40, packBudgetTokens = 2000L)


  /** The SHARED persisted curation prefix over the documents corpus:
    * filter → scrub → exact dedup → near-dup removal (pairs from the
    * persisted band index), built once per JVM ([[graft.operators
    * .Curation.curatedCorpusFor]]) — both pipeline rows chunk+pack from
    * this one artifact.
    */
  private[graft] def docsCurated(s: org.apache.spark.sql.SparkSession, dir: String) =
    graft.operators.Curation.curatedCorpusFor(
      table(s, dir, "documents"),
      cacheKey = s"$dir/documents!curated",
      "doc_id", "text", curationCfg,
      nearDupPairs = Some(Dedup.minhashPairsFromIndex(docsMinhashIdx(s, dir),
        numHashes = 128, threshold = 0.5)))


  /** One oracle for BOTH hybrid-RRF rows: the scan-legged exact anchor
    * (`q_hybrid_rrf`) and the index-served production path
    * (`q_hybrid_rrf_ann`, whose all-cluster probe makes the dense leg
    * exactly the cosine ranking) fuse identical rank lists, so one SQL
    * text gates both physical plans.
    */
  private[graft] val hybridRrfOracleSql: Option[String] =
      Some(s"""
        WITH lens AS (SELECT doc_id, CAST(len($sqlTokens) AS BIGINT) AS dl FROM documents),
        stats AS (SELECT CAST(count(*) AS DOUBLE) AS nd, CAST(sum(dl) AS DOUBLE) AS tot FROM lens),
        tok AS (SELECT doc_id, unnest($sqlTokens) AS token FROM documents),
        tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
               WHERE token IN ('vector', 'spark', 'customer') GROUP BY 1, 2),
        dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        scored AS (SELECT doc_id,
            sum(ln((nd - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5) + 1.0)
              * (CAST(tf AS DOUBLE) * (1.2 + 1.0))
              / (CAST(tf AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * CAST(dl AS DOUBLE) / (tot / nd)))) AS score
          FROM tf JOIN dfq USING (token) JOIN lens USING (doc_id) CROSS JOIN stats
          GROUP BY doc_id),
        bm AS (SELECT doc_id AS id,
            CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
          FROM scored ORDER BY score DESC, doc_id LIMIT 20),
        ann AS (SELECT vec_id AS id,
            CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
          FROM (SELECT vec_id,
              list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) AS cos
            FROM embeddings WHERE vec_id <> 0)
          ORDER BY cos DESC, vec_id LIMIT 20),
        fused AS (SELECT COALESCE(bm.id, ann.id) AS id,
            bm.rank AS rank_0, ann.rank AS rank_1,
            (CASE WHEN bm.rank IS NOT NULL THEN 1.0 / CAST(60 + bm.rank AS DOUBLE) ELSE 0.0 END)
            + (CASE WHEN ann.rank IS NOT NULL THEN 1.0 / CAST(60 + ann.rank AS DOUBLE) ELSE 0.0 END) AS rrf
          FROM bm FULL OUTER JOIN ann ON bm.id = ann.id)
        SELECT id, CAST(row_number() OVER (ORDER BY rrf DESC, id) AS BIGINT) AS rank,
          rank_0, rank_1, rrf
        FROM fused ORDER BY rrf DESC, id LIMIT 10""")


  /** Shared CTE chain for the int8 rows: quantize the query (vec_id = 0)
    * and every corpus vector with the exact [[Similarity.quantizeInt8]]
    * arithmetic (widen to double, `x·127/maxabs + 0.5`, floor; all-zero
    * vector → all-zero codes), then the integer dot product per corpus
    * vector — DuckDB zip-unnests the two BIGINT lists positionally.
    */
  // a def, not a val: pqQueries above interpolates this during object
  // init, before a later-declared val would be assigned
  private[graft] def int8ScoreCtes: String = """
        WITH q0 AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0),
        qm AS (SELECT v, list_max(list_transform(v, x -> abs(x))) AS m FROM q0),
        qq AS (SELECT CASE WHEN m > 0
            THEN list_transform(v, x -> CAST(floor(x * 127.0 / m + 0.5) AS BIGINT))
            ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS qv FROM qm),
        t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings WHERE vec_id <> 0),
        tm AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS m FROM t),
        tq AS (SELECT vec_id, CASE WHEN m > 0
            THEN list_transform(v, x -> CAST(floor(x * 127.0 / m + 0.5) AS BIGINT))
            ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS tv FROM tm),
        s AS (SELECT vec_id, CAST(sum(a * b) AS BIGINT) AS iscore FROM
               (SELECT vec_id, unnest(tv) AS a, unnest(qv) AS b
                FROM tq CROSS JOIN qq) z
             GROUP BY vec_id)"""


  /** The chained per-stage DuckDB oracle of `Curation.pretrainingPipeline`
    * (battery config: en / 0.3 / near-dup 0.5 / chunk 40/40 / pack 2000).
    * The scrub stage is provably a no-op on this corpus (0 regex hits for
    * all three PII patterns, verified in DuckDB), so the chain skips it;
    * the near-dup stage reuses the exact golden pair fixture restricted to
    * filter+dedup survivors (band collisions are per-pair, so the
    * full-corpus fixture restricted to surviving endpoints IS the pair set
    * of the filtered corpus). `decontam = true` inserts the
    * q_decontaminate CTEs (benchmark = raw doc_id % 10 = 0 slice) between
    * near-dup removal and chunking.
    */
  private[graft] def curationOracleSql(decontam: Boolean,
                                spans: Boolean = false,
                                semdecon: Boolean = false): String = {
    val (ctes, src) = curationChainCtes(decontam, spans, semdecon)
    s"""
        WITH RECURSIVE
        $ctes,
        st AS (SELECT doc_id, toks, unnest(range(0, len(toks), 40)) AS start
               FROM (SELECT doc_id, $sqlTokens AS toks FROM $src) WHERE len(toks) > 0),
        chunks AS (SELECT doc_id, CAST(start // 40 AS BIGINT) AS chunk_id,
          array_to_string(list_slice(toks, start + 1, start + 40), ' ') AS chunk_text,
          CAST(len(list_slice(toks, start + 1, start + 40)) AS BIGINT) AS n_tokens
          FROM st),
        packed AS (SELECT *, COALESCE(sum(n_tokens) OVER (ORDER BY doc_id, chunk_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before FROM chunks)
        SELECT doc_id, chunk_id, chunk_text, n_tokens,
          CAST(before // 2000 AS BIGINT) AS pack_id
        FROM packed"""
  }


  /** Attrition oracle: the same CTE chain with BOTH decontamination
    * stages armed, consumed as a first-drop-stage labeling — one row per
    * raw document, stage indices mirroring
    * [[graft.operators.Curation.attritionReport]].
    */
  private[graft] def attritionOracleSql: String = {
    val (ctes, _) = curationChainCtes(decontam = true, spans = false, semdecon = true)
    s"""
        WITH RECURSIVE
        $ctes,
        sel AS (
          SELECT doc_id, 1 AS stage_idx, 'lang_quality' AS stage FROM documents
            WHERE doc_id NOT IN (SELECT doc_id FROM kept)
          UNION ALL SELECT doc_id, 2, 'exact_dup' FROM kept
            WHERE doc_id NOT IN (SELECT doc_id FROM exact)
          UNION ALL SELECT doc_id, 3, 'near_dup' FROM exact
            WHERE doc_id NOT IN (SELECT doc_id FROM surv)
          UNION ALL SELECT doc_id, 4, 'decontam' FROM surv
            WHERE doc_id IN (SELECT doc_id FROM contaminated)
          UNION ALL SELECT doc_id, 5, 'semantic_decontam' FROM final
            WHERE doc_id IN (SELECT doc_id FROM sembad)
          UNION ALL SELECT doc_id, 6, 'kept' FROM semfinal)
        SELECT doc_id, CAST(stage_idx AS INT) AS stage_idx, stage FROM sel"""
  }


  /** The admission prefix of every curation oracle (tokenize → language/
    * quality features → `kept`), parameterized by a WHERE suffix on the
    * documents source so the streaming chain can run it on the
    * `doc_id < 500` loop slice. Mirrors `langQualityKeep` exactly.
    */
  private[graft] def admissionCtes(where: String): String =
    s"""t0 AS (SELECT doc_id, text, $sqlTokens AS toks FROM documents$where),
        feat AS (SELECT doc_id, text, toks,
          CASE WHEN length(text) = 0 THEN 0.0
               ELSE CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE) / length(text) END AS punct_ratio,
          CASE WHEN len(toks) = 0 THEN 0.0
               ELSE CAST(len(list_filter(toks, x -> list_contains(['the','a','an','and','of','to','in','is','it','that'], x))) AS DOUBLE) / len(toks) END AS stopword_ratio,
          least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) AS len_signal,
          len(list_filter(toks, x -> list_contains(['the','and','of','to','is','in','that','it'], x))) AS s_en,
          len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht','ein','zu'], x))) AS s_de,
          len(list_filter(toks, x -> list_contains(['le','la','les','et','est','un','une','dans'], x))) AS s_fr,
          len(list_filter(toks, x -> list_contains(['el','los','las','es','un','una','que','en'], x))) AS s_es
          FROM t0),
        kept AS (SELECT doc_id, text FROM feat
          WHERE greatest(s_en, s_de, s_fr, s_es) > 0
            AND s_en = greatest(s_en, s_de, s_fr, s_es)
            AND greatest(least(len_signal * 0.4 + least(stopword_ratio * 4.0, 1.0) * 0.4
                  + (1.0 - least(punct_ratio * 10.0, 1.0)) * 0.2, 1.0), 0.0) >= 0.3)"""


  /** The curation pipeline's oracle CTE chain (filter → exact dedup →
    * golden-pair near-dedup → optional n-gram/semantic decontamination →
    * optional span removal), shared by the three pipeline oracles and the
    * attrition oracle: returns (cteBlock, nameOfFinalSurvivorCte).
    */
  private[graft] def curationChainCtes(decontam: Boolean, spans: Boolean,
                                semdecon: Boolean): (String, String) = {
    val gram = (1 to 7).foldLeft("toks[i]") { (acc, k) => s"$acc || ' ' || toks[i+$k]" }
    val decontamCtes = if (!decontam) "" else s""",
        sg AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 6),
                 i -> $gram))) AS gr
               FROM (SELECT doc_id, $sqlTokens AS toks FROM surv) WHERE len(toks) >= 8),
        bg AS (SELECT DISTINCT unnest(list_distinct(list_transform(range(1, len(toks) - 6),
                 i -> $gram))) AS gr
               FROM (SELECT $sqlTokens AS toks FROM documents WHERE doc_id % 10 = 0)
               WHERE len(toks) >= 8),
        contaminated AS (SELECT DISTINCT doc_id FROM sg JOIN bg USING (gr)),
        final AS (SELECT doc_id, text FROM surv
                  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated))"""
    val srcNg = if (decontam) "final" else "surv"
    // SEMANTIC decontamination stage: survivors whose embedding (vec_id
    // keyed to doc_id, corpus slice vec_id >= 50) reaches cosine 0.4
    // against ANY benchmark embedding (the fixed vec_id < 50 suite) drop;
    // docs without an embedding row pass through — the stage contract.
    val semCtes = if (!semdecon) "" else s""",
        sembad AS (SELECT DISTINCT e.vec_id AS doc_id
          FROM embeddings e, embeddings b
          WHERE e.vec_id >= 50 AND b.vec_id < 50
            AND e.vec_id IN (SELECT doc_id FROM $srcNg)
            AND list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                  CAST(b.embedding AS DOUBLE[])) >= 0.4),
        semfinal AS (SELECT doc_id, text FROM $srcNg
                     WHERE doc_id NOT IN (SELECT doc_id FROM sembad))"""
    val src0 = if (semdecon) "semfinal" else srcNg
    // ExactSubstr stage (q_span_dedup's raw-string-gram formulation, run
    // over the curated survivors): spans of >= spanMinTokens covered by
    // corpus-repeated 8-grams are CUT, touched docs rebuilt from the
    // surviving tokens single-space joined, untouched docs byte-identical
    val spanCtes = if (!spans) "" else s""",
        tkS AS (SELECT doc_id, text, $sqlTokens AS toks FROM $src0),
        gS0 AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(toks) - 6, 1)),
                  i -> {'pos': i - 1, 'gr': $gram})) AS u FROM tkS),
        gS AS (SELECT doc_id, CAST(u.pos AS BIGINT) AS pos, u.gr AS gr FROM gS0),
        cntS AS (SELECT gr, count(*) AS c FROM gS GROUP BY 1),
        dupS AS (SELECT doc_id, pos FROM gS JOIN cntS USING (gr) WHERE c >= 2),
        islS AS (SELECT doc_id, pos,
            sum(CASE WHEN prev IS NULL OR pos - prev > 8 THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY pos) AS island
          FROM (SELECT doc_id, pos,
                  lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
                FROM dupS)),
        spansS AS (SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
                   FROM islS GROUP BY doc_id, island),
        spB AS (SELECT doc_id, list({'s': s, 'e': e}) AS sp FROM spansS
                WHERE e - s + 1 >= 8 GROUP BY doc_id),
        respanned AS (SELECT t.doc_id,
            CASE WHEN b.sp IS NULL THEN t.text
                 ELSE array_to_string(list_filter(
                   list_transform(range(1, len(t.toks) + 1),
                     i -> CASE WHEN len(list_filter(b.sp,
                            x -> i - 1 >= x.s AND i - 1 <= x.e)) = 0
                          THEN t.toks[i] END),
                   x -> x IS NOT NULL), ' ')
            END AS text
          FROM tkS t LEFT JOIN spB b USING (doc_id))"""
    val src = if (spans) "respanned" else src0
    (s"""${admissionCtes("")},
        exact AS (SELECT doc_id, text FROM
          (SELECT doc_id, text, row_number() OVER (PARTITION BY text ORDER BY doc_id) rn
           FROM kept) WHERE rn = 1),
        edges AS (SELECT id1, id2 FROM
          read_parquet('/root/repo/src/test/resources/golden/q_dedup_minhash/*.parquet')
          WHERE id1 IN (SELECT doc_id FROM exact) AND id2 IN (SELECT doc_id FROM exact)),
        und AS (SELECT id1 AS a, id2 AS b FROM edges UNION SELECT id2, id1 FROM edges),
        reach AS (SELECT a, b FROM und
                  UNION SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
        comp AS (SELECT a AS id, least(a, min(b)) AS component FROM reach GROUP BY a),
        surv AS (SELECT e.doc_id, e.text FROM exact e LEFT JOIN comp c ON e.doc_id = c.id
                 WHERE c.id IS NULL OR c.component = e.doc_id)$decontamCtes$semCtes$spanCtes""",
      src)
  }


  // Shared DuckDB CTE: gap-based sessionization of the events table
  // (mirrors EventStreams.sessionizeBatch at gapMinutes = 30).
  private[graft] val sessionCte = """
        WITH lagged AS (
          SELECT user_id, event_id, ts,
            lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
          FROM events),
        flagged AS (
          SELECT *, CASE WHEN prev_ts IS NULL
              OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END AS new_sess
          FROM lagged),
        sess AS (
          SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS sess_id
          FROM flagged)"""


  /** DuckDB mirror of [[graft.operators.Graph.pageRank]]'s exact integer
    * iteration, unrolled to `iters` CTEs over the customer↔supplier
    * co-purchase graph. The arithmetic is floor division on non-negative
    * longs at every step, so both engines produce identical bits.
    */
  /** DuckDB twin of the quantile sketch's dyadic-node md5 bucket
    * (`Profile.qNodeItem` + `cmsBucket`): bucket of node (level, prefix)
    * for hash row r — `md5("l@prefix:r")`, first 8 hex chars as BIGINT,
    * mod width. All three operands arrive as SQL expressions.
    */
  private[graft] def qsketchBucketSql(l: String, p: String, r: String,
                               width: Int): String =
    s"CAST(('0x' || substring(md5(CAST($l AS VARCHAR) || '@' || " +
      s"CAST($p AS VARCHAR) || ':' || CAST($r AS VARCHAR)), 1, 8)) " +
      s"AS BIGINT) % $width"


  /** The quantile-walk oracle: recomputes the (merged) sketch from the
    * raw data, then replays `Profile.quantileEstimate`'s dyadic descent
    * as `levels` chained CTE steps — at each level the LEFT child's CMS
    * estimate (min over depth hash rows) decides the branch, identical
    * integer arithmetic to the engine's driver-side walk.
    */
  private[graft] def qsketchQuantilesOracleSql(levels: Int, depth: Int, width: Int,
                                        qs: Seq[Long]): Option[String] = {
    // every step references its predecessor TWICE (le + the carry), so
    // un-materialized CTE inlining would re-expand the whole chain
    // 2^levels times — MATERIALIZED pins each step to one evaluation
    val steps = (levels - 1 to 0 by -1).map { l =>
      s"""le$l AS MATERIALIZED (SELECT w.q, MIN(COALESCE(c.cnt, 0)) AS le
           FROM w${l + 1} w CROSS JOIN range($depth) r(i)
           LEFT JOIN cms c ON c.l = $l AND c.r = r.i
             AND c.b = ${qsketchBucketSql(l.toString, "(2 * w.p)", "r.i", width)}
           GROUP BY 1),
         w$l AS MATERIALIZED (SELECT w.q, w.t,
            CAST(CASE WHEN w.t <= w.racc + e.le THEN 2 * w.p
                 ELSE 2 * w.p + 1 END AS BIGINT) AS p,
            CAST(CASE WHEN w.t <= w.racc + e.le THEN w.racc
                 ELSE w.racc + e.le END AS BIGINT) AS racc
          FROM w${l + 1} w JOIN le$l e ON e.q = w.q)"""
    }.mkString(",\n")
    Some(s"""
      WITH vals AS (SELECT CAST(length(text) AS BIGINT) AS v FROM documents),
      cms AS MATERIALIZED (SELECT l.i AS l, r.i AS r,
          ${qsketchBucketSql("l.i", "(v >> l.i)", "r.i", width)} AS b,
          CAST(count(*) AS BIGINT) AS cnt
        FROM vals CROSS JOIN range($levels) l(i) CROSS JOIN range($depth) r(i)
        GROUP BY 1, 2, 3),
      ntab AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM cms
               WHERE l = 0 AND r = 0),
      qs AS (SELECT CAST(unnest([${qs.mkString(", ")}]) AS BIGINT) AS q),
      w$levels AS MATERIALIZED (SELECT q, GREATEST(1, (n * q) // 1000000) AS t,
          CAST(0 AS BIGINT) AS p, CAST(0 AS BIGINT) AS racc
        FROM qs CROSS JOIN ntab),
      $steps
      SELECT w.q AS q_ppm, w.p AS value, n.n AS n
      FROM w0 w CROSS JOIN ntab n""")
  }


  private[graft] def pagerankOracleSql(iters: Int): Option[String] = {
    val q = 1L << 40
    val rounds = (1 to iters).map { k =>
      s"""r$k AS (SELECT n.node,
           CAST((($q * 15) // 100) // c + COALESCE(s.i, 0) AS BIGINT) AS r
         FROM nodes n CROSS JOIN nn
         LEFT JOIN (SELECT e.dst,
             CAST(sum((r.r * 85) // (100 * o.od)) AS BIGINT) AS i
           FROM e JOIN r${k - 1} r ON e.src = r.node
           JOIN outd o ON e.src = o.src
           GROUP BY e.dst) s ON n.node = s.dst)"""
    }.mkString(",\n")
    Some(s"""
      WITH pr AS (SELECT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      e AS (SELECT DISTINCT src, dst FROM
              (SELECT src, dst FROM pr UNION ALL SELECT dst, src FROM pr)),
      outd AS (SELECT src, CAST(count(*) AS BIGINT) AS od FROM e GROUP BY 1),
      nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      nn AS (SELECT CAST(count(*) AS BIGINT) AS c FROM nodes),
      r0 AS (SELECT node, CAST($q // c AS BIGINT) AS r
             FROM nodes CROSS JOIN nn),
      $rounds
      SELECT node, r AS rank_q FROM r$iters""")
  }


  /** One oracle for BOTH `q_bm25` and `q_bm25_indexed` — the indexed
    * serving path is contractually equal to the scan path when no matched
    * token overflows the postings cap (true here: the corpus is far below
    * the default cap).
    */
  private[graft] lazy val bm25OracleSql: Option[String] =
    Some(s"""
        WITH lens AS (SELECT doc_id, CAST(len($sqlTokens) AS BIGINT) AS dl FROM documents),
        stats AS (SELECT CAST(count(*) AS DOUBLE) AS nd, CAST(sum(dl) AS DOUBLE) AS tot FROM lens),
        tok AS (SELECT doc_id, unnest($sqlTokens) AS token FROM documents),
        tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
               WHERE token IN ('vector', 'spark', 'customer') GROUP BY 1, 2),
        dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        scored AS (SELECT doc_id,
            sum(ln((nd - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5) + 1.0)
              * (CAST(tf AS DOUBLE) * (1.2 + 1.0))
              / (CAST(tf AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * CAST(dl AS DOUBLE) / (tot / nd)))) AS score,
            CAST(count(*) AS BIGINT) AS n_terms,
            CAST(sum(tf) AS BIGINT) AS sum_tf,
            max(dl) AS dl
          FROM tf JOIN dfq USING (token) JOIN lens USING (doc_id) CROSS JOIN stats
          GROUP BY doc_id)
        SELECT doc_id AS id,
          CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
          n_terms, sum_tf, dl
        FROM scored ORDER BY score DESC, doc_id LIMIT 10""")


  // def, not val: referenced by battery rows constructed textually above.
  // One micro-batch of q_drift_embed_stream's oracle — the q_drift_embed
  // arithmetic with the batch's b-side filter and a batch_id column.
  private[graft] def embedDriftBatchOracle(i: Int): String = s"""
        (WITH e AS (SELECT vec_id, label,
            list_transform(embedding,
              x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qe
          FROM embeddings),
        xa AS (SELECT label, unnest(qe) AS q,
            unnest(range(1, len(qe) + 1)) AS pos FROM e WHERE vec_id % 2 = 0),
        xb AS (SELECT label, unnest(qe) AS q,
            unnest(range(1, len(qe) + 1)) AS pos FROM e
          WHERE vec_id % 2 <> 0 AND vec_id % 3 = $i),
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
          dist2, CAST($i AS BIGINT) AS batch_id
        FROM cta FULL OUTER JOIN ctb ON cta.label = ctb.label
        LEFT JOIN met ON met.label = COALESCE(cta.label, ctb.label))"""


  private[graft] def cdcMergeOracleSql = """
        WITH base AS (SELECT o_orderkey, o_orderstatus,
            CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
        SELECT o_orderkey, o_orderstatus,
          CASE WHEN o_orderkey % 5 = 0 THEN cents + 100 ELSE cents END AS cents,
          CAST(CASE WHEN o_orderkey % 5 = 0 THEN 2 ELSE 1 END AS BIGINT) AS v
        FROM base WHERE o_orderkey % 10 <> 0"""


  // Unique memory-sink names: one battery row can run several times in a
  // JVM (bench warm-up + timed runs); the memory sink registers a temp
  // view per query name, so names must not collide across runs.
  private[graft] val memSinkSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  private[graft] def memSinkName(prefix: String): String =
    s"${prefix}_${memSinkSeq.incrementAndGet()}"


  // The MemoryStream rows drive PINNED ≤5k-row streams, but a stateful
  // streaming query allocates one state-store instance per shuffle
  // partition per operator PER MICRO-BATCH — at the battery's 32
  // partitions that fixed overhead dwarfs the data (q_session_stream
  // read 6.7 s of which <1 s is work). Production streams size their own
  // partitions; these rows clamp to 4 for the query's lifetime and
  // restore. Results are partition-invariant (the oracles don't change).
  private[graft] def withShufflePartitions[T](s: org.apache.spark.sql.SparkSession,
                                       n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val old = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, old)
  }


  // --- TRUE STRUCTURED-STREAMING battery rows: previously spec-only
  // operators (EventStreamsSpec) driven through a real MemoryStream →
  // memory-sink query inside the row, gated by exact DuckDB oracles.
  // Inputs pin event_id < 5000 on BOTH sides so the expected answer is
  // scale-factor-independent (the ingest-loop row-design rule) and the
  // driver-side collect that feeds the MemoryStream stays bounded at any
  // sf. The collect is the stream-HARNESS boundary, not the operator's
  // plan — production feeds arrive from Kafka/files; the operators
  // themselves are watermarked streaming transforms with bounded state.
  //
  // Each stateful row runs under TWO split protocols (VERDICT-r16 #5):
  // the even 3-way split and an UNEVEN one (a 1-row trickle, then one
  // huge batch, then the remainder) — real arrival is bursty, and
  // watermark/state progress under skewed batch sizes must produce the
  // SAME answer as the even protocol (the `_uneven` rows share their
  // even twin's oracle verbatim).
  /** Split `n` items into batch lengths: even thirds, or 1/≈80%/rest. */
  private[graft] def evenSplit(n: Int): Seq[Int] = {
    val b = math.max(1, (n + 2) / 3); Seq(b, b, math.max(0, n - 2 * b))
  }

  private[graft] def unevenSplit(n: Int): Seq[Int] = {
    val big = math.max(1, (n - 1) * 4 / 5)
    Seq(1, big, math.max(0, n - 1 - big))
  }

  private[graft] def slicesOf[T](items: Array[T], sizes: Seq[Int]): Seq[Array[T]] = {
    var off = 0
    sizes.map { len =>
      val s = items.slice(off, math.min(items.length, off + len))
      off += len; s
    }.filter(_.nonEmpty)
  }


  private[graft] def runSessionStream(s: org.apache.spark.sql.SparkSession,
                               dir: String,
                               split: Int => Seq[Int]): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val pinned = events(s, dir).filter(col("event_id") < 5000)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[graft.streaming.Event].collect()
      .sortBy(e => (e.ts.getTime, e.event_id))
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[graft.streaming.Event]
    val name = memSinkName("sess_stream_out")
    withShufflePartitions(s, 4) {
      val q = EventStreams
        .sessionizeStreamEventTime(mem.toDS(), gapMinutes = 30,
          watermarkDelay = "1 minutes")
        .writeStream.outputMode("append").format("memory")
        .queryName(name).start()
      try {
        slicesOf(pinned, split(pinned.length)).foreach { b =>
          mem.addData(b.toSeq: _*); q.processAllAvailable()
        }
        val far = pinned.map(_.ts.getTime).max + 90L * 24 * 3600 * 1000
        mem.addData(graft.streaming.Event(
          -1L, new java.sql.Timestamp(far), -1L, "view", 0.0))
        q.processAllAvailable()
      } finally q.stop()
    }
    s.table(name).filter(col("user_id") =!= -1L)
      .select("user_id", "session_start", "session_end", "n_events")
  }

  /** The sessionizer driven through a REAL FILE SOURCE at
    * `maxFilesPerTrigger = 1` — the rate-limited ingest shape production
    * streams actually run (one file per micro-batch, the watermark
    * advancing file by file), completing the MemoryStream twins with a
    * source whose batch boundaries the ENGINE draws, not the harness.
    * Slice files are written time-ordered with STRICTLY INCREASING
    * mtimes and lexicographic names (the file source orders pending
    * files by modification time, path-tiebroken; same-ms mtimes would
    * make the batch order nondeterministic on a fast filesystem), the
    * far-future sentinel as the LAST file so event-time timeouts flush
    * every open session. Same oracle as the MemoryStream twin: the
    * source must be invisible in the flushed sessions.
    */
  private[graft] def runSessionStreamFiles(s: org.apache.spark.sql.SparkSession,
                                    dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val pinned = events(s, dir).filter(col("event_id") < 5000)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[graft.streaming.Event].collect()
      .sortBy(e => (e.ts.getTime, e.event_id))
    val root = Queries.tempDir("graft_sessfiles")
    val srcDir = s"$root/in"
    new java.io.File(srcDir).mkdirs()
    val far = pinned.map(_.ts.getTime).max + 90L * 24 * 3600 * 1000
    val batches = slicesOf(pinned, evenSplit(pinned.length)) :+
      Array(graft.streaming.Event(
        -1L, new java.sql.Timestamp(far), -1L, "view", 0.0))
    batches.zipWithIndex.foreach { case (b, i) =>
      val stage = s"$root/stage_$i"
      s.createDataset(b.toSeq).coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no parquet part under $stage"))
      val dest = new java.io.File(srcDir, f"slice-$i%03d.parquet")
      require(part.renameTo(dest), s"rename $part -> $dest failed")
      java.nio.file.Files.setLastModifiedTime(dest.toPath,
        java.nio.file.attribute.FileTime.fromMillis(1000L * (i + 1)))
    }
    val name = memSinkName("sess_files_out")
    withShufflePartitions(s, 4) {
      val src = s.readStream
        .schema(org.apache.spark.sql.Encoders.product[graft.streaming.Event].schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(srcDir)
        .as[graft.streaming.Event]
      val q = EventStreams
        .sessionizeStreamEventTime(src, gapMinutes = 30,
          watermarkDelay = "1 minutes")
        .writeStream.outputMode("append").format("memory")
        .queryName(name).start()
      try q.processAllAvailable() finally q.stop()
    }
    s.table(name).filter(col("user_id") =!= -1L)
      .select("user_id", "session_start", "session_end", "n_events")
  }


  private[graft] val sessionStreamOracle = Some("""
        WITH src AS (SELECT event_id, user_id,
            date_trunc('milliseconds', ts) AS ts
          FROM events WHERE event_id < 5000),
        lagged AS (
          SELECT user_id, event_id, ts,
            lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
          FROM src),
        flagged AS (
          SELECT *, CASE WHEN prev_ts IS NULL
              OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END AS new_sess
          FROM lagged),
        sess AS (
          SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS sess_id
          FROM flagged)
        SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
          count(*) AS n_events
        FROM sess GROUP BY user_id, sess_id""")


  private[graft] def runEventDedupStream(s: org.apache.spark.sql.SparkSession,
                                  dir: String,
                                  split: Int => Seq[Int]): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val pinned = events(s, dir).filter(col("event_id") < 5000)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[graft.streaming.Event].collect()
    def replay(e: graft.streaming.Event, secs: Long) = e.copy(
      ts = new java.sql.Timestamp(e.ts.getTime + secs * 1000),
      value = e.value + 999.0)
    // the split yields the ORIGINALS per batch; every later batch also
    // re-sends every EARLIER batch's events as garbled retransmissions
    val parts = slicesOf(pinned, split(pinned.length))
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[graft.streaming.Event]
    val name = memSinkName("dedup_stream_out")
    withShufflePartitions(s, 4) {
      val q = EventStreams
        .dedupStream(mem.toDF(), Seq("event_id"), watermarkDelay = "90 days")
        .writeStream.outputMode("append").format("memory")
        .queryName(name).start()
      try {
        parts.zipWithIndex.foreach { case (b, i) =>
          val replays = parts.take(i).zipWithIndex.flatMap { case (p, j) =>
            p.map(replay(_, (i - j).toLong))
          }
          mem.addData((b ++ replays).toSeq: _*); q.processAllAvailable()
        }
      } finally q.stop()
    }
    s.table(name).select(col("event_id"), col("user_id"),
      col("event_type"), round(col("value") * 100).cast("long").as("cents"),
      col("ts"))
  }

  private[graft] val eventDedupOracle = Some("""
        SELECT event_id, user_id, event_type,
          CAST(round(value * 100) AS BIGINT) AS cents, ts
        FROM events WHERE event_id < 5000""")


  private[graft] def runHeavyStream(s: org.apache.spark.sql.SparkSession,
                             dir: String,
                             split: Int => Seq[Int]): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val docs = table(s, dir, "documents").filter(col("doc_id") < 30)
      .select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)].collect()
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String)]
    val outPath = Queries.tempDir("graft_hhstream") + "/out"
    val sink = (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                id: Long) =>
      df.withColumn("__batch_id", lit(id))
        .write.mode("append").parquet(outPath)
    withShufflePartitions(s, 4) {
      val q = graft.streaming.DocumentStreams
        .heavyTokensStream(mem.toDF().toDF("doc_id", "lang", "text"),
          "lang", "text", k = 64)
        .toDF("g", "hh")
        .writeStream.outputMode("update").foreachBatch(sink).start()
      try {
        slicesOf(docs, split(docs.length)).foreach { b =>
          mem.addData(b.toSeq: _*); q.processAllAvailable()
        }
      } finally q.stop()
    }
    s.read.parquet(outPath).groupBy(col("g"))
      .agg(graft.functions.ArgExtremum.argRow(
        struct(col("hh")), struct(col("__batch_id")), isMax = true).as("w"))
      .select(col("g").as("lang"), posexplode(col("w.hh")).as(Seq("__pos", "e")))
      .select(col("lang"), col("e._1").as("token"), col("e._2").as("cnt"),
        (col("__pos") + 1).cast("long").as("rank"))
  }

  private[graft] val heavyStreamOracle = Some(s"""
        WITH tok AS (SELECT lang, unnest($sqlTokens) AS token
          FROM documents WHERE doc_id < 30),
        cnt AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS cnt
          FROM tok GROUP BY 1, 2)
        SELECT lang, token, cnt,
          CAST(row_number() OVER (PARTITION BY lang
            ORDER BY cnt DESC, token) AS BIGINT) AS rank
        FROM cnt""")


  // --- STREAMING INGEST-DEDUP LOOP rows: the four modality loops driven
  // batch-by-batch inside one row (the q_cms_stream pattern — fixed batch
  // split of the sf corpus, exact oracle over the loops' published
  // output). Each row gates the WHOLE loop end to end: per-batch
  // hashing, the grow-only index probe (first-arrival-wins; the index
  // grows by survivors only), the no-transitive-drop-via-unpublished
  // eligibility rule, in-batch min-id dedup, and the __batch_id
  // publication layout. The text/media/video oracles SIMULATE the loop
  // in pure SQL over an independently-gated pair relation (the committed
  // golden minhash pairs resp. the arithmetic-recomputed perceptual
  // hashes — per-item hashes don't depend on the corpus split, so the
  // full pair table restricted to batch×history IS the loop's relation);
  // the embedding loop gates against a GoldenGen driver mirror (LSH
  // bucket codes are not SQL-expressible).
  /** Compaction/refit twins' shared layout assert: the whole table must
    * live in exactly ONE `__batch_id=` partition (the seed) after the
    * operation, or the row fails before serving anything.
    */
  private[graft] def assertSinglePartition(path: String, what: String): Unit = {
    val dirs = new java.io.File(path).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("__batch_id="))
    require(dirs == 1,
      s"$what left $dirs __batch_id partitions at $path, expected 1 (seed)")
  }


  /** The q_doc_ingest_stream protocol, shared with its compaction twin:
    * FIXED 500-doc input (ids 0..499 — the whole corpus at sf0.01, so the
    * oracle is unchanged there); production ingest batches are
    * constant-size while history grows, so the row's input must be
    * constant across SFs too (the q_cdc_incremental / StreamLoopProbe
    * row-design lesson); history-growth scaling is StreamLoopProbe's job.
    */
  private[graft] def runDocIngest(s: org.apache.spark.sql.SparkSession, dir: String,
                           compactAfterBatch1: Boolean)
      : org.apache.spark.sql.DataFrame = {
    val docs = table(s, dir, "documents").filter(col("doc_id") < 500)
    val base = Queries.tempDir("graft_docingest")
    val idxPath = s"$base/idx"; val outPath = s"$base/out"
    // nightly seed: the doc_id%3==0 slice is pre-published history
    graft.streaming.DocumentStreams.seedIndex(
      Dedup.minhashBandIndex(docs.filter(col("doc_id") % 3 === 0),
        "doc_id", "text", shingleSize = 3, numHashes = 128, bands = 32),
      idxPath)
    def run(i: Int): Unit =
      graft.streaming.DocumentStreams.processBatch(
        docs.filter(col("doc_id") % 3 === i), i.toLong,
        "doc_id", "text", idxPath, outPath,
        shingleSize = 3, numHashes = 128, bands = 32, threshold = 0.5)
    run(1)
    if (compactAfterBatch1) {
      graft.streaming.DocumentStreams.compactIndex(s, idxPath,
        uptoBatch = 1L, targetFiles = 2)
      assertSinglePartition(idxPath, "compactIndex")
    }
    run(2)
    s.read.parquet(outPath)
      .select(col("doc_id"), col("__batch_id").cast("long").as("batch_id"))
  }


  private[graft] lazy val docIngestOracle: Option[String] =
      Some("""
        WITH p AS (SELECT id1, id2 FROM read_parquet(
            '/root/repo/src/test/resources/golden/q_dedup_minhash/*.parquet')),
        und AS (SELECT id1 AS a, id2 AS b FROM p
                UNION ALL SELECT id2, id1 FROM p),
        d AS (SELECT doc_id, doc_id % 3 AS bt FROM documents
              WHERE doc_id < 500),
        s0 AS (SELECT doc_id FROM d WHERE bt = 0),
        e1 AS (SELECT doc_id FROM d WHERE bt = 1 AND doc_id NOT IN
                (SELECT u.a FROM und u JOIN s0 ON u.b = s0.doc_id)),
        k1 AS (SELECT doc_id FROM e1 WHERE doc_id NOT IN
                (SELECT p.id2 FROM p JOIN e1 x ON p.id1 = x.doc_id
                 JOIN e1 y ON p.id2 = y.doc_id)),
        h2 AS (SELECT doc_id FROM s0 UNION ALL SELECT doc_id FROM k1),
        e2 AS (SELECT doc_id FROM d WHERE bt = 2 AND doc_id NOT IN
                (SELECT u.a FROM und u JOIN h2 ON u.b = h2.doc_id)),
        k2 AS (SELECT doc_id FROM e2 WHERE doc_id NOT IN
                (SELECT p.id2 FROM p JOIN e2 x ON p.id1 = x.doc_id
                 JOIN e2 y ON p.id2 = y.doc_id))
        SELECT doc_id, CAST(1 AS BIGINT) AS batch_id FROM k1
        UNION ALL
        SELECT doc_id, CAST(2 AS BIGINT) AS batch_id FROM k2""")


  /** The q_curated_ingest_stream / q_curated_metrics_stream protocol:
    * the FULL streaming curation loop ([[graft.streaming.DocumentStreams
    * .processCuratedBatch]] — admission → PII scrub → exact dedup (batch
    * + history hash index) → near-dedup (batch + growing band index) →
    * n-gram decontamination → publish), bootstrapped from EMPTY indices,
    * over the docs<500 slice in three doc_id%3 batches with the
    * attrition-metrics sink armed. Returns (outPath, metricsPath).
    *
    * Oracle-ability rests on two measured corpus facts the batch
    * pipeline rows already lean on: the scrub is an identity on this
    * corpus (0 regex hits for all three PII patterns at every SF,
    * verified in DuckDB), so the committed raw-text golden minhash pairs
    * ARE the scrubbed-text pair relation; and signatures are per-doc, so
    * the full-corpus pair fixture restricted to each stage's survivor
    * set is exactly the pair relation the loop sees.
    */
  private[graft] def runCuratedIngest(s: org.apache.spark.sql.SparkSession,
                               dir: String): (String, String) = {
    val docs = table(s, dir, "documents").filter(col("doc_id") < 500)
    val base = Queries.tempDir("graft_curingest")
    val exactP = s"$base/exact"; val bandP = s"$base/band"
    val outP = s"$base/out"; val metP = s"$base/metrics"
    // the q_curation_decontam suite (raw doc_id % 10 = 0 slice of the
    // FULL corpus), prebuilt once per (JVM, corpus) — the loop contract
    val grams = graft.operators.Curation.benchGramsFor(
      table(s, dir, "documents").filter(col("doc_id") % 10 === 0),
      cacheKey = s"$dir/documents!benchgrams", "text")
    (0 until 3).foreach { i =>
      graft.streaming.DocumentStreams.processCuratedBatch(
        docs.filter(col("doc_id") % 3 === i), i.toLong, "doc_id", "text",
        curationCfg, exactP, bandP, outP,
        shingleSize = 3, numHashes = 128, bands = 32,
        decontamGrams = Some(grams), metricsPath = Some(metP))
    }
    (outP, metP)
  }


  /** The shared oracle CTE chain for both curated-ingest rows: the
    * [[docIngestOracle]] loop simulation composed with the admission
    * filter, per-batch exact dedup (in-batch smallest-id + published-
    * history text), first-arrival-wins near-dedup over the golden pair
    * fixture, and per-batch n-gram decontamination — each batch's
    * published set `p{i}` feeding the next batch's history, exactly the
    * loop's grow-only-index semantics (contaminated and dropped docs are
    * never indexed and never suppress future docs).
    */
  private[graft] lazy val curatedIngestChain: String = {
    val gram = (1 to 7).foldLeft("toks[i]") { (acc, k) => s"$acc || ' ' || toks[i+$k]" }
    def batch(i: Int): String = {
      val hist = (0 until i)
      val xCte =
        if (hist.isEmpty) s"x$i AS MATERIALIZED (SELECT doc_id, text FROM xb$i)"
        else {
          val histTexts = hist.map(j => s"SELECT text FROM p$j").mkString(" UNION ALL ")
          s"x$i AS MATERIALIZED (SELECT doc_id, text FROM xb$i WHERE text NOT IN ($histTexts))"
        }
      val dCte =
        if (hist.isEmpty) s"d$i AS MATERIALIZED (SELECT doc_id FROM xb$i WHERE FALSE)"
        else {
          val histIds = hist.map(j => s"SELECT doc_id FROM p$j").mkString(" UNION ALL ")
          s"""d$i AS MATERIALIZED (SELECT DISTINCT x.doc_id FROM x$i x JOIN und u ON x.doc_id = u.a
              WHERE u.b IN ($histIds))"""
        }
      s"""
        a$i AS MATERIALIZED (SELECT doc_id, text FROM keptb WHERE bt = $i),
        xb$i AS MATERIALIZED (SELECT doc_id, text FROM
           (SELECT doc_id, text, row_number() OVER (PARTITION BY text ORDER BY doc_id) rn
            FROM a$i) WHERE rn = 1),
        $xCte,
        $dCte,
        f$i AS MATERIALIZED (SELECT doc_id, text FROM x$i
                WHERE doc_id NOT IN (SELECT doc_id FROM d$i)),
        n$i AS MATERIALIZED (SELECT doc_id, text FROM f$i WHERE doc_id NOT IN
                (SELECT p.id2 FROM p JOIN f$i fa ON p.id1 = fa.doc_id
                 JOIN f$i fb ON p.id2 = fb.doc_id)),
        sg$i AS MATERIALIZED (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 6),
                   i -> $gram))) AS gr
                 FROM (SELECT doc_id, $sqlTokens AS toks FROM n$i) WHERE len(toks) >= 8),
        c$i AS MATERIALIZED (SELECT DISTINCT doc_id FROM sg$i JOIN bg USING (gr)),
        p$i AS MATERIALIZED (SELECT doc_id, text FROM n$i
                WHERE doc_id NOT IN (SELECT doc_id FROM c$i))"""
    }
    s"""${admissionCtes(" WHERE doc_id < 500")},
        keptb AS MATERIALIZED (SELECT doc_id, text, doc_id % 3 AS bt FROM kept),
        p AS MATERIALIZED (SELECT id1, id2 FROM read_parquet(
            '/root/repo/src/test/resources/golden/q_dedup_minhash/*.parquet')),
        und AS MATERIALIZED (SELECT id1 AS a, id2 AS b FROM p
                UNION ALL SELECT id2, id1 FROM p),
        bg AS MATERIALIZED (SELECT DISTINCT unnest(list_distinct(list_transform(range(1, len(toks) - 6),
                 i -> $gram))) AS gr
               FROM (SELECT $sqlTokens AS toks FROM documents WHERE doc_id % 10 = 0)
               WHERE len(toks) >= 8),
        ${batch(0)},
        ${batch(1)},
        ${batch(2)}"""
  }


  private[graft] lazy val curatedIngestOracle: Option[String] =
    Some(s"""
        WITH $curatedIngestChain
        SELECT doc_id, CAST(0 AS BIGINT) AS batch_id FROM p0
        UNION ALL SELECT doc_id, CAST(1 AS BIGINT) AS batch_id FROM p1
        UNION ALL SELECT doc_id, CAST(2 AS BIGINT) AS batch_id FROM p2""")


  /** The attrition-metrics funnel recomputed per batch: every count is a
    * cardinality of a chain CTE, and the per-stage columns are the same
    * consecutive differences the loop writes (disjoint drop sets by
    * construction).
    */
  private[graft] lazy val curatedMetricsOracle: Option[String] = {
    def row(i: Int): String = s"""
        SELECT CAST($i AS BIGINT) AS batch_id,
          (SELECT count(*) FROM allb WHERE bt = $i) AS n_in,
          (SELECT count(*) FROM allb WHERE bt = $i)
            - (SELECT count(*) FROM a$i) AS n_filtered,
          (SELECT count(*) FROM a$i) - (SELECT count(*) FROM xb$i) AS n_exact_dup,
          (SELECT count(*) FROM xb$i) - (SELECT count(*) FROM x$i) AS n_exact_history,
          (SELECT count(*) FROM d$i) AS n_dup_history,
          (SELECT count(*) FROM x$i) - (SELECT count(*) FROM n$i)
            - (SELECT count(*) FROM d$i) AS n_dup_batch,
          (SELECT count(*) FROM n$i) - (SELECT count(*) FROM p$i) AS n_contaminated,
          (SELECT count(*) FROM p$i) AS n_published"""
    Some(s"""
        WITH $curatedIngestChain,
        allb AS (SELECT doc_id, doc_id % 3 AS bt FROM documents WHERE doc_id < 500)
        ${row(0)} UNION ALL ${row(1)} UNION ALL ${row(2)}""")
  }


  /** The q_chunk_ingest_stream protocol, shared with its compaction twin
    * (fixed 500-blob input — the q_doc_ingest_stream contract).
    */
  private[graft] def runChunkIngest(s: org.apache.spark.sql.SparkSession,
                             dir: String, compactAfterBatch1: Boolean)
      : org.apache.spark.sql.DataFrame = {
    val blobs = Multimodal.withGradientImagePayload(
      table(s, dir, "documents").select("doc_id")
        .filter(col("doc_id") < 500).repartition(32),
      "doc_id")
    val base = Queries.tempDir("graft_chunkingest")
    val idxPath = s"$base/idx"; val statsPath = s"$base/stats"
    def run(i: Int): Unit =
      graft.streaming.ChunkStoreStreams.processChunkBatch(
        blobs.filter(col("doc_id") % 3 === i), i.toLong,
        "doc_id", "payload", idxPath, statsPath,
        minSize = 64, maskBits = 6, maxSize = 512)
    run(0); run(1)
    if (compactAfterBatch1) {
      graft.streaming.DocumentStreams.compactIndex(s, idxPath,
        uptoBatch = 1L, targetFiles = 2)
      assertSinglePartition(idxPath, "compactIndex")
    }
    run(2)
    s.read.parquet(statsPath).select(
      col("__batch_id").cast("long").as("batch_id"),
      col("batch_chunks"), col("batch_bytes"),
      col("hit_chunks"), col("hit_bytes"),
      col("dup_chunks"), col("dup_bytes"),
      col("stored_chunks"), col("stored_bytes"))
  }


  private[graft] lazy val chunkIngestOracle: Option[String] =
      Some("""
        WITH b AS (SELECT id, "offset", length, hash, id % 3 AS bt
                   FROM read_parquet(
                     '/root/repo/src/test/resources/golden/q_cdc_chunks/*.parquet')
                   WHERE id < 500),
        fb AS (SELECT hash, length, min(bt) AS first_bt
               FROM b GROUP BY 1, 2),
        lab AS (SELECT b.bt, b.length,
            CASE WHEN b.bt > f.first_bt THEN 'hit'
                 WHEN row_number() OVER (PARTITION BY b.bt, b.hash, b.length
                        ORDER BY b.id, b."offset") = 1 THEN 'first'
                 ELSE 'dup' END AS status
          FROM b JOIN fb f ON b.hash = f.hash AND b.length = f.length)
        SELECT CAST(bt AS BIGINT) AS batch_id,
          CAST(count(*) AS BIGINT) AS batch_chunks,
          CAST(sum(length) AS BIGINT) AS batch_bytes,
          CAST(sum(CASE WHEN status = 'hit' THEN 1 ELSE 0 END) AS BIGINT) AS hit_chunks,
          CAST(sum(CASE WHEN status = 'hit' THEN length ELSE 0 END) AS BIGINT) AS hit_bytes,
          CAST(sum(CASE WHEN status = 'dup' THEN 1 ELSE 0 END) AS BIGINT) AS dup_chunks,
          CAST(sum(CASE WHEN status = 'dup' THEN length ELSE 0 END) AS BIGINT) AS dup_bytes,
          CAST(sum(CASE WHEN status = 'first' THEN 1 ELSE 0 END) AS BIGINT) AS stored_chunks,
          CAST(sum(CASE WHEN status = 'first' THEN length ELSE 0 END) AS BIGINT) AS stored_bytes
        FROM lab GROUP BY 1""")
}
