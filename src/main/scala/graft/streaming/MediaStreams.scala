package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming ingest-time dedup for MEDIA — the multimodal twin of
  * [[DocumentStreams.ingestDedup]]: each micro-batch hashes its payloads
  * with a pluggable 64-bit perceptual hasher
  * ([[graft.operators.Multimodal.dHash64]] for images,
  * [[graft.operators.Multimodal.audioFingerprint64]] for audio, SimHash
  * for text), drops items whose hash sits within `maxDistance` of the
  * growing published index (FIRST-ARRIVAL-WINS — the only policy an
  * online system can implement without revoking published items;
  * same-id matches count, so an identical item re-sent under its
  * published id in a later batch is dropped, not republished) or of a
  * smaller-id batchmate that itself survived the history probe, and
  * appends survivors to the lake plus their hashes to the index.
  *
  * State is ONE grow-only parquet index of (id, sh) longs — 16 bytes per
  * published item, so a billion-item media lake carries a ~16 GB index —
  * probe-joined per batch by the pigeonhole chunk key
  * ([[Dedup.incrementalHammingPairs]]): history is never re-decoded or
  * re-hashed. Undecodable payloads (NULL hash) pass through un-deduped —
  * an opaque blob is not evidence of duplication; route them by policy
  * downstream. Paths are loop-owned (hive-partitioned by `__batch_id`,
  * dynamic partition overwrite), so at-least-once foreachBatch retries
  * rewrite their own partitions and history probes exclude the in-flight
  * batch — the same idempotence contract as the document loops
  * ([[DocumentStreams.writeBatchPartition]] / `readHistory`).
  */
object MediaStreams {

  /** Wire a streaming media source into the ingest-dedup loop.
    * `hasher` maps (rows, idCol) to an (id, sh) table — pass a
    * [[graft.operators.Multimodal]] hasher partially applied to the
    * payload column. `indexPath` seeds via [[DocumentStreams.seedIndex]]
    * (or bootstraps from absent); `outPath` receives survivors.
    *
    * `maxBucket > 0` arms [[Dedup.simhashPairsFromTable]]'s
    * degenerate-chunk guard on both the history probe and the in-batch
    * pairing — set it when the corpus can carry many near-constant items
    * (smooth images, silent clips): the drop DECISIONS only need
    * connectivity, which the guard preserves for exact cliques.
    */
  def ingestMediaDedup(newMedia: DataFrame, idCol: String,
                       hasher: (DataFrame, String) => DataFrame,
                       indexPath: String, outPath: String,
                       maxDistance: Int = 3,
                       maxBucket: Int = 0): DataStreamWriter[Row] =
    newMedia.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      processMediaBatch(batch, batchId, idCol, hasher, indexPath, outPath,
        maxDistance, maxBucket)
    }

  /** One micro-batch of the loop (factored out so batch semantics are
    * testable without a streaming harness).
    */
  private[streaming] def processMediaBatch(batch: DataFrame, batchId: Long,
                                           idCol: String,
                                           hasher: (DataFrame, String) => DataFrame,
                                           indexPath: String, outPath: String,
                                           maxDistance: Int,
                                           maxBucket: Int = 0): Unit = {
    val spark = batch.sparkSession
    val hashed = hasher(batch, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val decodable = hashed.filter(col("sh").isNotNull)
    val history =
      if (DocumentStreams.pathExists(spark, indexPath))
        DocumentStreams.readHistory(spark, indexPath, batchId)
          .select("id", "sh")
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], decodable.schema)
    // near-dup of an already-published item: drop the NEW one.
    // excludeSelf = false: the batch side is unpublished by construction
    // (readHistory excludes the in-flight batch's partition), so a
    // same-id match against the index is a RE-SENT published item —
    // without this a duplicate re-ingest under its original id would
    // slip past dedup into a second lake row. (A same-id re-send mutated
    // beyond maxDistance is not a near-dup and is out of scope here:
    // policing id collisions needs a full-index id probe per batch,
    // an upstream key-integrity concern, not a content-dedup one.)
    val dupOfHistory = Dedup.incrementalHammingPairs(decodable, history,
        maxDistance, excludeSelf = false, maxBucket = maxBucket)
      .select(col("new_id").as("__drop"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // near-dup WITHIN the batch, computed over items that survived the
    // history probe: a batchmate can only be dropped via an item that is
    // itself eligible for publication — an item dropped as dup-of-history
    // must not transitively drop neighbours that are far from everything
    // published. Chains within the batch still collapse (smallest id of
    // each connected pair survives) — the same transitive-cluster policy
    // as the batch pipeline's connected-components dedup.
    val batchEligible = decodable.join(dupOfHistory,
      decodable("id") === col("__drop"), "left_anti")
    val dupInBatch = Dedup.simhashPairsFromTable(batchEligible, maxDistance,
        maxBucket)
      .select(col("id2").as("__drop"))
    val dropIds = dupOfHistory.union(dupInBatch).distinct()
    val survivors = batch
      .join(dropIds, batch(idCol) === col("__drop"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    DocumentStreams.writeBatchPartition(survivors, batchId, outPath)
    // the index grows by the DECODABLE SURVIVORS' hashes only: dropped
    // items never entered the lake and must not suppress future items;
    // null-hash passthroughs carry no evidence to index
    DocumentStreams.writeBatchPartition(
      decodable.join(survivors.select(col(idCol).as("__keep")),
        decodable("id") === col("__keep"), "left_semi"),
      batchId, indexPath)
    survivors.unpersist()
    dupOfHistory.unpersist()
    hashed.unpersist()
  }
}
