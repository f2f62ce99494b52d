package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** STREAMING CHUNK-STORE ingest — the storage-layer family's daily-ingest
  * loop, completing the streaming dedup matrix (documents, media, video,
  * embeddings, and now byte storage): each micro-batch of blobs is
  * CDC-chunked, probes the grow-only `(hash, length)` chunk index
  * ([[Dedup.incrementalCdcChunks]] — history scanned with the batch keys
  * broadcast, never shuffled), and only the `'first'` chunks — the bytes
  * a dedup-aware store actually writes — append to the index. A per-batch
  * [[Dedup.cdcIngestStats]] row appends to a stats path: the dashboard
  * feed for "how much did today's ingest really cost".
  *
  * State layout is the loops' shared contract: both paths hive-partitioned
  * by `__batch_id`; the probe reads history EXCLUDING the in-flight
  * batch's partition, so an at-least-once `foreachBatch` retry recomputes
  * identical labels (chunking is deterministic) and rewrites exactly its
  * own partitions. Compact with [[DocumentStreams.compactIndex]] — chunk
  * index rows are probe-side facts keyed by `(hash, length)`, tolerant of
  * the write-then-delete discipline (a transiently duplicated index row
  * cannot change any `status`: hit-dominates and the `left_semi` probe
  * dedups keys).
  */
object ChunkStoreStreams {

  def ingestChunkStore(newBlobs: DataFrame, idCol: String, binCol: String,
                       indexPath: String, statsPath: String,
                       minSize: Int = 2048, maskBits: Int = 11,
                       maxSize: Int = 65536): DataStreamWriter[Row] =
    newBlobs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      processChunkBatch(batch, batchId, idCol, binCol, indexPath, statsPath,
        minSize, maskBits, maxSize)
    }

  /** One micro-batch (factored out so batch semantics are testable
    * without a streaming harness).
    */
  private[graft] def processChunkBatch(batch: DataFrame, batchId: Long,
                                       idCol: String, binCol: String,
                                       indexPath: String, statsPath: String,
                                       minSize: Int, maskBits: Int,
                                       maxSize: Int): Unit = {
    val spark = batch.sparkSession
    // cold start: an existing-but-empty index dir (fresh deployment) is
    // the same as no index — only a non-empty path can carry history
    def hasData: Boolean = {
      val p = new org.apache.hadoop.fs.Path(indexPath)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.exists(p) && fs.listStatus(p).nonEmpty
    }
    val history =
      if (hasData)
        DocumentStreams.readHistory(spark, indexPath, batchId)
          .select("hash", "length")
      else {
        import spark.implicits._
        Seq.empty[(Long, Long)].toDF("hash", "length")
      }
    // releasable form: the operator persists the batch chunk table for its
    // three consumers; a per-micro-batch loop that never released it would
    // accumulate one cached table per batch for the life of the JVM
    val (rawAnn, releaseChunks) = Dedup.incrementalCdcChunksReleasable(
      batch, idCol, binCol, history, minSize, maskBits, maxSize)
    // materializeCut, not persist: BOTH sinks consume the annotated
    // table, and a parquet write does not load a cached child's buffers —
    // persisted, each sink re-ran the probe-and-annotate joins (and the
    // index write then invalidated the cache for any later consumer via
    // refreshByPath). The CDC chunk pass runs exactly once into blocks.
    val ann = DocumentStreams.materializeCut(rawAnn)
    // CONCURRENT sinks (round-20, §2.6 — supersedes the round-19
    // stats-before-index ordering, which protected a PERSISTED ann from
    // the index commit's refreshByPath): ann is lineage-cut, so both
    // writes read an RDD scan no refresh can invalidate, and ordering
    // stops mattering. Both writes stay per-batch-partition idempotent;
    // a crash now leaves any subset committed — either way the batch
    // retry rewrites both. The index grows by the batch's 'first' chunks
    // only: hits are already stored; dups deduped against the batch's
    // own firsts.
    DocumentStreams.writeBatchPartitionsPar(Seq(
      Dedup.cdcIngestStats(ann) -> statsPath,
      ann.filter(col("status") === "first")
        .select("id", "offset", "length", "hash") -> indexPath),
      batchId)
    DocumentStreams.releaseCut(ann)
    releaseChunks()
  }
}
