package graft

import graft.functions.TextFunctions._
import graft.operators.{Dedup, Multimodal, Similarity}
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._

/** One family section of the LLM-data-pipeline extension
  * battery (split out of ExtQueries.scala at round 19 — no
  * behavior change; see [[ExtQueries.all]] for the union).
  */
private[graft] object DedupBattery {
  import Queries.{Q, table, events}
  import BatteryUtil._


  val queries: Seq[(String, Q)] = Seq(
    // Exact dedup: smallest doc_id survives per distinct text.
    "q_dedup_exact" -> Q(
      (s, dir) => Dedup.exact(table(s, dir, "documents"), col("text"), col("doc_id")),
      Some("""SELECT doc_id, text, lang, source, n_chars FROM
             (SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) rn
              FROM documents) t WHERE rn = 1""")),

    // Exact word-trigram Jaccard pairs (≥ 0.5). Oracle does the naive
    // quadratic version; the Spark path adds only a provably lossless
    // size-ratio guard, so results must match exactly.
    "q_dedup_ngram" -> Q(
      (s, dir) => Dedup.ngramJaccardPairsFromSets(
        Dedup.ngramSetsFor(table(s, dir, "documents"),
          cacheKey = s"$dir/documents!ngram", "doc_id", "text"),
        threshold = 0.5),
      Some(s"""
        WITH sh AS (
          SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
          FROM (SELECT doc_id, $sqlTokens AS toks FROM documents)
          WHERE len(toks) >= 3)
        SELECT a.doc_id AS id1, b.doc_id AS id2,
          CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
        FROM sh a, sh b
        WHERE a.doc_id < b.doc_id
          AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5""")),

    // DIRECTED CONTAINMENT pairs (|A∩B|/|A| ≥ 0.8): the asymmetric
    // quote/excerpt detector symmetric Jaccard misses. Contained-side
    // lossless prefix filter × container posting list; engine joins
    // hashed shingles, oracle intersects raw strings (the q_dedup_ngram
    // collision argument).
    "q_containment" -> Q(
      (s, dir) => Dedup.ngramContainmentPairsFromSets(
        Dedup.ngramSetsFor(table(s, dir, "documents"),
          cacheKey = s"$dir/documents!ngram", "doc_id", "text"),
        threshold = 0.8),
      Some(s"""
        WITH sh AS (
          SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
          FROM (SELECT doc_id, $sqlTokens AS toks FROM documents)
          WHERE len(toks) >= 3)
        SELECT a.doc_id AS id1, b.doc_id AS id2,
          CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh) AS containment
        FROM sh a, sh b
        WHERE a.doc_id <> b.doc_id
          AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh) >= 0.8""")),

    // Cross-document repeated-line (boilerplate) removal: later
    // occurrences of any ≥10-char line drop, the globally-first survives,
    // short/blank lines always stay. Engine shuffles 64-bit line hashes +
    // a hash-aggregate first-occurrence (never a per-line window); the
    // oracle is the window formulation over raw line text.
    "q_line_dedup" -> Q(
      (s, dir) => Dedup.dropRepeatedLines(table(s, dir, "documents"),
        "doc_id", "text", minLineLen = 10),
      Some("""
        WITH l AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
                     unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos
                   FROM documents),
        r AS (SELECT doc_id, line, pos,
                CASE WHEN length(line) >= 10
                     THEN row_number() OVER (PARTITION BY line ORDER BY doc_id, pos)
                     ELSE 1 END AS rn
              FROM l),
        k AS (SELECT doc_id, line, pos FROM r WHERE rn = 1),
        agg AS (SELECT doc_id AS id,
                  string_agg(line, chr(10) ORDER BY pos) AS text,
                  CAST(count(*) AS BIGINT) AS n_kept
                FROM k GROUP BY doc_id)
        SELECT a.id, a.text,
          CAST(len(string_split(d.text, chr(10))) AS BIGINT) AS n_lines,
          CAST(len(string_split(d.text, chr(10))) - a.n_kept AS BIGINT) AS n_dropped
        FROM agg a JOIN documents d ON a.id = d.doc_id""")),

    // MinHash-LSH near-dup pairs — approximate wrt true Jaccard but fully
    // DETERMINISTIC given the seeds, so the golden brute-force (all-pairs
    // band agreement + signature estimate) is an exact oracle for the
    // distributed banding/join/distinct machinery.
    "q_dedup_minhash" -> Q(
      (s, dir) => Dedup.minhashPairsFromIndex(docsMinhashIdx(s, dir),
        numHashes = 128, threshold = 0.5).select(col("id1"), col("id2")),
      golden("q_dedup_minhash")),

    // SimHash near-dup pairs (Hamming ≤ 3 over 64-bit token simhash).
    // Pigeonhole chunking is lossless for d ≤ 3 over 4 chunks, so the
    // golden all-pairs Hamming scan is the exact expectation.
    "q_dedup_simhash" -> Q(
      (s, dir) => Dedup.simhashPairsFromTable(
        Dedup.simhashTableFor(table(s, dir, "documents"),
          cacheKey = s"$dir/documents!simhash", "doc_id", "text"),
        maxDistance = 3),
      golden("q_dedup_simhash")),

    // Corpus after greedy near-dup removal (LSH pairs, smaller id survives).
    "q_neardup_drop" -> Q(
      (s, dir) => Dedup.dropNearDuplicates(table(s, dir, "documents"), "doc_id",
        Dedup.minhashPairsFromIndex(docsMinhashIdx(s, dir),
          numHashes = 128, threshold = 0.5)),
      golden("q_neardup_drop")),

    // QUALITY-AWARE survivor policy: cluster the near-dup pair graph
    // (connected components) and keep the LONGEST document per cluster
    // (score = n_chars; ties -> smallest id) — "keep the best copy"
    // where the min-id policies keep whichever was crawled first.
    // Oracle: the q_dedup_clusters recursive-CC formulation over the
    // committed golden pair fixture + a per-component row_number pick.
    "q_neardup_keep_best" -> Q(
      (s, dir) => Dedup.keepBestPerCluster(table(s, dir, "documents"), "doc_id",
        Dedup.minhashPairsFromIndex(docsMinhashIdx(s, dir),
          numHashes = 128, threshold = 0.5),
        col("n_chars")),
      Some(s"""
        WITH RECURSIVE
        edges AS (SELECT id1, id2 FROM
          read_parquet('/root/repo/src/test/resources/golden/q_dedup_minhash/*.parquet')),
        und AS (SELECT id1 AS a, id2 AS b FROM edges
                UNION SELECT id2, id1 FROM edges),
        reach AS (SELECT a, b FROM und
                  UNION SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
        comp AS (SELECT a AS id, least(a, min(b)) AS component FROM reach GROUP BY a),
        lab AS (SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars,
                  COALESCE(c.component, d.doc_id) AS comp
                FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
        r AS (SELECT *, row_number() OVER
                (PARTITION BY comp ORDER BY n_chars DESC, doc_id) AS rn
              FROM lab)
        SELECT doc_id, text, lang, source, n_chars FROM r WHERE rn = 1""")),

    // INCREMENTAL dedup: a "new batch" (doc_id >= 250) probed against the
    // persisted band index of the "history" (doc_id < 250) — the history is
    // joined, never re-hashed. Oracle: the exact golden full-corpus pair
    // fixture restricted to cross pairs (deterministic seeds make the
    // split-and-probe path produce identical band collisions).
    "q_dedup_incremental" -> Q(
      (s, dir) => {
        val idx = docsMinhashIdx(s, dir)
        Dedup.incrementalNearDupsIndexed(
          Dedup.sliceIndex(idx, col("id") >= 250),
          Dedup.sliceIndex(idx, col("id") < 250),
          numHashes = 128, threshold = 0.5)
          .select("new_id", "old_id")
      },
      Some("""SELECT id2 AS new_id, id1 AS old_id
             FROM read_parquet('/root/repo/src/test/resources/golden/q_dedup_minhash/*.parquet')
             WHERE id1 < 250 AND id2 >= 250""")),

    // Transitive near-dup clustering: connected components over the
    // MinHash-LSH pair graph (A~B, B~C ⇒ one cluster even without an A~C
    // pair). The oracle computes the closure independently — a recursive
    // CTE over the committed golden pair fixture (itself exact-checked by
    // q_dedup_minhash) — so the distributed hash-min iteration is gated
    // against a genuinely different algorithm.
    // Near-dup GOVERNANCE reports over the committed pair fixture: which
    // sources carry the duplicate mass (counts + n_chars-weighted, exact
    // integer ppm), and the cluster-size histogram with singletons as
    // the denominator. Both are bounded aggregates over pair/component
    // tables — the reports cost the pairs plus one corpus scan.
    "q_dup_mass" -> Q(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        Dedup.dupMassByGroup(docs, "doc_id", "source",
          Dedup.minhashPairsFromIndex(docsMinhashIdx(s, dir),
            numHashes = 128, threshold = 0.5),
          weight = col("n_chars"))
      },
      Some("""
        WITH members AS (SELECT DISTINCT id FROM (
            SELECT id1 AS id FROM read_parquet('/root/repo/src/test/resources/golden/q_dedup_minhash/*.parquet')
            UNION ALL
            SELECT id2 FROM read_parquet('/root/repo/src/test/resources/golden/q_dedup_minhash/*.parquet')))
        SELECT d.source AS "group",
          CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(CASE WHEN m.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
          CAST(sum(CASE WHEN m.id IS NOT NULL THEN 1 ELSE 0 END) * 1000000
               // count(*) AS BIGINT) AS dup_ppm,
          CAST(sum(d.n_chars) AS BIGINT) AS w_total,
          CAST(sum(CASE WHEN m.id IS NOT NULL THEN d.n_chars ELSE 0 END) AS BIGINT) AS w_dup,
          CAST(sum(CASE WHEN m.id IS NOT NULL THEN d.n_chars ELSE 0 END) * 1000000
               // sum(d.n_chars) AS BIGINT) AS dup_w_ppm
        FROM documents d LEFT JOIN members m ON d.doc_id = m.id
        GROUP BY 1""")),

    "q_cluster_sizes" -> Q(
      (s, dir) => Dedup.clusterSizeHistogram(
        Dedup.connectedComponents(table(s, dir, "documents"), "doc_id",
          Dedup.minhashPairsFromIndex(docsMinhashIdx(s, dir),
            numHashes = 128, threshold = 0.5))),
      Some(s"""
        WITH RECURSIVE
        edges AS (SELECT id1, id2 FROM
          read_parquet('/root/repo/src/test/resources/golden/q_dedup_minhash/*.parquet')),
        und AS (SELECT id1 AS a, id2 AS b FROM edges
                UNION SELECT id2, id1 FROM edges),
        reach AS (SELECT a, b FROM und
                  UNION SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
        comp AS (SELECT a AS id, least(a, min(b)) AS component FROM reach GROUP BY a),
        labeled AS (SELECT d.doc_id AS id, COALESCE(c.component, d.doc_id) AS component
          FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
        sizes AS (SELECT component, CAST(count(*) AS BIGINT) AS size
          FROM labeled GROUP BY 1)
        SELECT size, CAST(count(*) AS BIGINT) AS n_clusters
        FROM sizes GROUP BY 1""")),

    "q_dedup_clusters" -> Q(
      (s, dir) => Dedup.connectedComponents(table(s, dir, "documents"), "doc_id",
        Dedup.minhashPairsFromIndex(docsMinhashIdx(s, dir),
          numHashes = 128, threshold = 0.5)),
      Some(s"""
        WITH RECURSIVE
        edges AS (SELECT id1, id2 FROM
          read_parquet('/root/repo/src/test/resources/golden/q_dedup_minhash/*.parquet')),
        und AS (SELECT id1 AS a, id2 AS b FROM edges
                UNION SELECT id2, id1 FROM edges),
        reach AS (SELECT a, b FROM und
                  UNION SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
        comp AS (SELECT a AS id, least(a, min(b)) AS component FROM reach GROUP BY a)
        SELECT d.doc_id AS id, COALESCE(c.component, d.doc_id) AS component
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.id""")),

    // LSH-blocked embedding near-dup pairs — the PRODUCTION path (bucket
    // join, no cross join). Approximate wrt TRUE near-dup recall (see the
    // exact q_embed_neardup twin + ANN_SWEEP.md) but fully DETERMINISTIC
    // given the seeded hyperplanes, so the golden all-pairs recomputation
    // (driver-loop bucket codes + sequential-cosine verify) exact-checks
    // the distributed explode/join/distinct machinery.
    "q_embed_neardup_lsh" -> Q(
      (s, dir) => Dedup.embeddingPairsLsh(table(s, dir, "embeddings"),
        "vec_id", "embedding", threshold = 0.45, planes = 3, tables = 8),
      golden("q_embed_neardup_lsh")),

    // The DENSITY-SCALED twin: planes/tables derived from the corpus
    // count by LshTuning.forCorpus (the production default when a caller
    // passes no tuning) — the end-to-end gate that the scaled path
    // computes real answers. The fixed-tuning row above stays as the
    // hand-tuned oracle anchor; this row is what survives 100× density
    // (SCALE.md: fixed tuning hit 26× wall at 10×). Golden fixture uses
    // the same closed-form tuner, so the gate breaks if tuner and
    // operator ever disagree.
    "q_embed_neardup_tuned" -> Q(
      (s, dir) => Dedup.embeddingPairsLsh(table(s, dir, "embeddings"),
        "vec_id", "embedding", threshold = 0.45),
      golden("q_embed_neardup_tuned")),

    // The degenerate-clique CERTIFICATE twin (maxBucket > 0): exact-
    // duplicate VECTORS collapse to min-id star edges and the bucket join
    // runs over DISTINCT vectors only — q_image_neardup_guarded's
    // smooth-media guard, ported to the embedding family (the
    // identically-embedded boilerplate hazard). The corpus gains real
    // cliques by duplicating the FIXED vec_id < 25 slice at id + 2^40
    // (constant across SF decades, the q_sem_contaminate suite rule; the
    // offset clears every derived corpus's id range). maxBucket = 1000
    // never triggers at gate scale — the cap path is spec-gated
    // adversarially, as on the Hamming twin. Golden driver mirror
    // recomputes the certificate: vector content groups → stars →
    // rep-level code-overlap + sequential-cosine pairs.
    "q_embed_neardup_guarded" -> Q(
      (s, dir) => {
        val emb = table(s, dir, "embeddings").select("vec_id", "embedding")
        val dups = emb.filter(col("vec_id") < 25)
          .withColumn("vec_id", col("vec_id") + lit(1L << 40))
        Dedup.embeddingPairsLsh(emb.unionByName(dups), "vec_id", "embedding",
          threshold = 0.45, planes = 3, tables = 8, maxBucket = 1000)
      },
      golden("q_embed_neardup_guarded")),

    // Embedding-cosine near-dup pairs: exact brute force, double math on
    // both sides (DuckDB must cast FLOAT[] → DOUBLE[] to match). The oracle
    // anchor for the LSH production path above.
    "q_embed_neardup" -> Q(
      (s, dir) => Dedup.embeddingPairs(table(s, dir, "embeddings"),
        "vec_id", "embedding", threshold = 0.45),
      Some("""SELECT a.vec_id AS id1, b.vec_id AS id2,
               list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) AS cos
             FROM embeddings a, embeddings b
             WHERE a.vec_id < b.vec_id
               AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.45""")),

    // SEMANTIC contamination (embedding-space, the paraphrase-robust
    // complement of q_decontaminate's verbatim n-gram join): corpus item
    // flags when its cosine to ANY "benchmark" item reaches 0.4. The
    // benchmark is the FIXED slice vec_id < 50 — an eval suite does not
    // grow with the training corpus, and the derived sf1/sf10 corpora
    // shift replica ids upward, so the slice is the same 50 vectors at
    // every decade and the row stays linear-in-corpus (a %-split bench
    // made it quadratic by construction: 28x at the third decade).
    // Benchmark broadcasts, corpus streams with the cosine inline in the
    // scan — nothing corpus-sized shuffles. Double math on both sides
    // (DuckDB casts FLOAT[] → DOUBLE[]), like q_embed_neardup.
    "q_sem_contaminate" -> Q(
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        graft.operators.Curation.semanticContaminationHits(
          emb.filter(col("vec_id") >= 50), "vec_id", "embedding",
          emb.filter(col("vec_id") < 50), "vec_id", "embedding",
          threshold = 0.4)
      },
      Some("""SELECT c.vec_id AS id, b.vec_id AS bench_id,
               list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) AS cos
             FROM embeddings c, embeddings b
             WHERE c.vec_id >= 50 AND b.vec_id < 50
               AND list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.4""")),

    // The hits as a FILTER: the decontaminated corpus (anti-join on the
    // sparse hit id set — AQE broadcasts it; the corpus never shuffles).
    // Projects the scalar columns so the gate hashes ids+labels, with the
    // dropped-row set pinned by the row above sharing one oracle family.
    "q_sem_decontaminate" -> Q(
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        graft.operators.Curation.semanticDecontaminate(
          emb.filter(col("vec_id") >= 50), "vec_id", "embedding",
          emb.filter(col("vec_id") < 50), "vec_id", "embedding",
          threshold = 0.4)
          .select(col("vec_id"), col("label"))
      },
      Some("""SELECT c.vec_id, c.label FROM embeddings c
             WHERE c.vec_id >= 50 AND NOT EXISTS (
               SELECT 1 FROM embeddings b
               WHERE b.vec_id < 50
                 AND list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.4)""")),

    // The LARGE-benchmark escape hatch the broadcast guard points at,
    // proven end-to-end: cross-table sign-LSH bucket join between corpus
    // and suite codes, vectors riding, cosine verified inline — never a
    // broadcast, never a candidate exchange. Approximate wrt the exact
    // row above (bucket-overlap recall) but DETERMINISTIC given the
    // seeded planes, so the golden driver-loop recomputation (code
    // overlap + sequential cosine) exact-checks the distributed
    // machinery, as q_embed_neardup_lsh / q_knn_join_lsh do.
    "q_sem_contaminate_lsh" -> Q(
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        graft.operators.Curation.semanticContaminationHitsLsh(
          emb.filter(col("vec_id") >= 50), "vec_id", "embedding",
          emb.filter(col("vec_id") < 50), "vec_id", "embedding",
          threshold = 0.4, planes = 3, tables = 8)
      },
      golden("q_sem_contaminate_lsh")),

    // INCREMENTAL embedding near-dup — the vector entry of the
    // incremental-dedup matrix (q_dedup_incremental = text band index,
    // q_image_incremental = 8-byte hash index, this = the embedding LSH
    // bucket index): a new slice probes the persisted slim-layout index
    // (history joined by stored codes, never re-hashed; vector lookups
    // pruned to candidates). Deterministic given the seeded planes →
    // golden driver-loop recomputation, as the whole LSH family.
    "q_embed_incremental" -> Q(
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        Dedup.incrementalEmbeddingPairsLsh(
          emb.filter(col("vec_id") % 20 === 7), "vec_id", "embedding",
          Dedup.embeddingLshIndex(
            emb.filter(col("vec_id") % 20 =!= 7), "vec_id", "embedding",
            planes = 3, tables = 8),
          threshold = 0.4, planes = 3, tables = 8)
      },
      golden("q_embed_incremental")),
  )
}
