package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming ingest-time dedup for EMBEDDINGS — the vector twin of
  * [[DocumentStreams.ingestDedup]] (text/MinHash) and
  * [[MediaStreams.ingestMediaDedup]] (media/Hamming), completing the
  * incremental-dedup matrix: each micro-batch's vectors probe the growing
  * published [[Dedup.embeddingLshIndex]] through the bucket-code join
  * ([[Dedup.incrementalEmbeddingPairsLsh]] — history joined by its stored
  * codes, never re-hashed; vector lookups pruned to candidates), drop
  * items at cosine ≥ `threshold` of a published item (FIRST-ARRIVAL-WINS;
  * same-id re-sends match themselves and are dropped) or of a smaller-id
  * batchmate that itself survived the history probe, and append survivors
  * to the lake plus their index rows to the index.
  *
  * State is ONE grow-only parquet in the slim layout (bucket rows are
  * (id, long) pairs; the vector is stored once per item), hive-partitioned
  * by `__batch_id` with the loops' usual retry-idempotence contract. The
  * loop FIXES the LSH tuning (planes/tables/seed) for the life of the
  * index — the index owns the tuning, so the density-scaled
  * `LshTuning.forCorpus` default of the batch operators does not apply
  * here (re-tuning would orphan every stored code; re-index to re-tune).
  */
object EmbeddingStreams {

  /** INGEST-TIME SEMANTIC DECONTAMINATION for the embedding loop — the
    * vector twin of [[DocumentStreams.ingestCurated]]'s `decontamGrams`
    * guard: a batch vector within cosine `threshold` of ANY vector of the
    * fixed eval-`suite` is neither published nor indexed (it never entered
    * the lake, so it also never suppresses a future item — the loops'
    * uniform dropped-item policy; an identical future vector is
    * contaminated too and drops the same way). The suite is CONSTANT and
    * broadcast-sized ([[graft.operators.Curation.semanticContaminationHits]]'
    * enforced guard; `maxSuite` is its ceiling) — per-batch cost tracks
    * the BATCH, never a growing history. Batch items with a NULL vector
    * bypass the guard (no embedding ⇒ nothing to compare — run the n-gram
    * guard in the DOCUMENT loop too; each catches what the other misses).
    */
  final case class SemanticGuard(suite: DataFrame,
                                 suiteIdCol: String, suiteVecCol: String,
                                 threshold: Double,
                                 maxSuite: Long = 100000L)

  /** Wire a streaming vector source into the ingest-dedup loop.
    * `indexPath` must hold [[Dedup.embeddingLshIndex]] rows built with the
    * SAME (planes, tables, seed), seeded via [[DocumentStreams.seedIndex]]
    * (or bootstrapped from absent); `outPath` receives surviving rows.
    * Optional `guard` arms [[SemanticGuard]] on dedup survivors
    * (cheapest-stage-first, matching the document loop's ordering).
    */
  /** Optional `metricsPath` arms the per-batch attrition metrics sink
    * (the [[DocumentStreams.ingestCurated]] pattern): one row per
    * micro-batch `(n_in, n_null_vec, n_dup_history, n_dup_batch,
    * n_contaminated, n_published)` — `n_null_vec` items PASS THROUGH
    * (published un-indexed and un-guarded), the rest are drop counts —
    * hive-partitioned by `__batch_id`, retry-idempotent. Opt-in because
    * the counts force extra per-batch jobs on the stage frames.
    */
  def ingestEmbeddingDedup(newVecs: DataFrame, idCol: String, vecCol: String,
                           indexPath: String, outPath: String,
                           threshold: Double = 0.8,
                           planes: Int = 3, tables: Int = 8,
                           seed: Long = 42L,
                           guard: Option[SemanticGuard] = None,
                           metricsPath: Option[String] = None): DataStreamWriter[Row] =
    newVecs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      processEmbeddingBatch(batch, batchId, idCol, vecCol, indexPath,
        outPath, threshold, planes, tables, seed, guard, metricsPath)
    }

  /** One micro-batch of the loop (factored out for direct batch-semantics
    * testing, like [[MediaStreams.processMediaBatch]]).
    */
  private[graft] def processEmbeddingBatch(batch: DataFrame, batchId: Long,
                                           idCol: String, vecCol: String,
                                           indexPath: String, outPath: String,
                                           threshold: Double,
                                           planes: Int, tables: Int,
                                           seed: Long,
                                           guard: Option[SemanticGuard] = None,
                                           metricsPath: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    val vecs = batch.select(col(idCol).cast("long").as("id"),
        col(vecCol).as("v"))
      .filter(col("v").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val history =
      if (DocumentStreams.pathExists(spark, indexPath))
        DocumentStreams.readHistory(spark, indexPath, batchId)
          .select("id", "v", "bkt")
      else spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        Dedup.embeddingLshIndex(vecs, "id", "v", planes, tables, seed).schema)
    // dup of a PUBLISHED vector: drop the NEW one. excludeSelf = false —
    // the batch side is unpublished (readHistory excludes the in-flight
    // partition), so a same-id index match is a RE-SENT published item
    val dupOfHistory = Dedup.incrementalEmbeddingPairsLsh(
        vecs, "id", "v", history, threshold, planes, tables, seed,
        excludeSelf = false)
      .select(col("new_id").as("__drop")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // within-batch pairing over history-probe SURVIVORS only (the loops'
    // no-transitive-drop-via-unpublished policy); smallest id survives.
    // FIXED tuning — the loop's contract, not the corpus-derived default.
    val eligible = vecs.join(dupOfHistory,
      vecs("id") === col("__drop"), "left_anti")
    val dupInBatch = Dedup.embeddingPairsLsh(eligible, "id", "v",
        threshold, planes, tables, seed)
      .select(col("id2").as("__drop"))
    val dropIds = dupOfHistory.union(dupInBatch).distinct()
    val deduped = batch
      .join(dropIds, batch(idCol).cast("long") === col("__drop"), "left_anti")
    // ingest-time semantic decontamination on dedup survivors (see
    // [[SemanticGuard]]): batch-sized vector set vs the constant
    // broadcast suite — contaminated items reach NO sink
    val survivors = (guard match {
      case Some(g) =>
        val dedupedVecs = vecs.join(
          deduped.select(col(idCol).cast("long").as("__did")),
          vecs("id") === col("__did"), "left_semi")
        val bad = graft.operators.Curation.semanticContaminationHits(
            dedupedVecs, "id", "v",
            g.suite, g.suiteIdCol, g.suiteVecCol, g.threshold, g.maxSuite)
          .select(col("id").as("__cdrop")).distinct()
        deduped.join(bad, deduped(idCol).cast("long") === col("__cdrop"),
          "left_anti")
      case None => deduped
    }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    DocumentStreams.writeBatchPartition(survivors, batchId, outPath)
    // the index grows by the SURVIVORS' rows only (null-vector rows never
    // entered `vecs`, so undecodable items pass through un-indexed)
    DocumentStreams.writeBatchPartition(
      Dedup.embeddingLshIndex(
        vecs.join(survivors.select(col(idCol).cast("long").as("__keep")),
          vecs("id") === col("__keep"), "left_semi"),
        "id", "v", planes, tables, seed),
      batchId, indexPath)
    metricsPath.foreach { mPath =>
      import spark.implicits._
      val nIn = batch.count()
      val nVecs = vecs.count()
      val nDupHistory = dupOfHistory.count()
      val nDeduped = deduped.count()
      val nPublished = survivors.count()
      // the within-batch pairing runs over history-probe survivors and
      // the guard over dedup survivors, so stage drop sets are disjoint
      // and counts are differences of consecutive survivor counts
      DocumentStreams.writeBatchPartition(Seq((
          nIn, nIn - nVecs, nDupHistory,
          nIn - nDeduped - nDupHistory, nDeduped - nPublished, nPublished))
        .toDF("n_in", "n_null_vec", "n_dup_history", "n_dup_batch",
          "n_contaminated", "n_published"),
        batchId, mPath)
    }
    survivors.unpersist()
    dupOfHistory.unpersist()
    vecs.unpersist()
  }

  /** STREAMING EMBEDDING-DRIFT MONITOR — the monitors family's vector
    * member (the [[SketchStreams]] KMV-novelty pattern): per micro-batch,
    * the batch's per-slice centroid shift against a CONSTANT reference
    * corpus ([[graft.operators.Profile.embeddingDrift]]; reference = side
    * A, the batch = side B), landed as one row per slice under
    * `__batch_id` — "is today's ingest drifting away from the corpus my
    * ANN index / quality model was fit on", answered before the index
    * degrades. Retry-idempotent: the row set is a pure function of
    * (reference, batch) and lands via dynamic partition overwrite.
    *
    * Per-batch cost tracks the BATCH plus one reference scan; pre-
    * aggregate the reference once (a future refinement) only if the
    * reference is corpus-sized — the intended reference is the bounded
    * fit/eval corpus.
    */
  def driftMonitorStream(newVecs: DataFrame, reference: DataFrame,
                         vecCol: String, sliceCols: Seq[String],
                         statsPath: String): DataStreamWriter[Row] =
    newVecs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      processDriftBatch(batch, batchId, reference, vecCol, sliceCols,
        statsPath)
    }

  /** One micro-batch of the drift monitor (factored out for direct
    * batch-semantics testing, like [[processEmbeddingBatch]]).
    */
  private[graft] def processDriftBatch(batch: DataFrame, batchId: Long,
                                       reference: DataFrame, vecCol: String,
                                       sliceCols: Seq[String],
                                       statsPath: String): Unit =
    DocumentStreams.writeBatchPartition(
      graft.operators.Profile.embeddingDrift(reference, batch, col(vecCol),
        sliceCols),
      batchId, statsPath)
}
