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
  * online system can implement without revoking published items) or of a
  * smaller-id batchmate, and appends survivors to the lake plus their
  * hashes to the index.
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
    */
  def ingestMediaDedup(newMedia: DataFrame, idCol: String,
                       hasher: (DataFrame, String) => DataFrame,
                       indexPath: String, outPath: String,
                       maxDistance: Int = 3): DataStreamWriter[Row] =
    newMedia.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      processMediaBatch(batch, batchId, idCol, hasher, indexPath, outPath,
        maxDistance)
    }

  /** One micro-batch of the loop (factored out so batch semantics are
    * testable without a streaming harness).
    */
  private[streaming] def processMediaBatch(batch: DataFrame, batchId: Long,
                                           idCol: String,
                                           hasher: (DataFrame, String) => DataFrame,
                                           indexPath: String, outPath: String,
                                           maxDistance: Int): Unit = {
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
    // near-dup of an already-published item: drop the NEW one
    val dupOfHistory = Dedup.incrementalHammingPairs(decodable, history, maxDistance)
      .select(col("new_id").as("__drop"))
    // near-dup within the batch: smallest id survives
    val dupInBatch = Dedup.simhashPairsFromTable(decodable, maxDistance)
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
    hashed.unpersist()
  }
}
