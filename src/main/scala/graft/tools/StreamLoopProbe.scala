package graft.tools

import graft.operators.{Dedup, Multimodal}
import graft.streaming.{DocumentStreams, MediaStreams}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the streaming ingest-dedup loops — the daily-ingest
  * shape the specs gate functionally but the bench battery doesn't time.
  * The contract under test is the loops' cost model: per-batch cost is
  * O(batch × collision rate), NOT O(history) — so the probe holds the
  * MICRO-BATCH FIXED (the last `batchSize` ids) and grows the seeded
  * history with the corpus (sf0.1 → sf1 → sf10). Flat batch times
  * across a 100× history are the evidence; a time growing with the
  * corpus would mean the probe join re-reads history.
  *
  * args: [sfDir] [batchSize=10000] — run per scale, numbers land in
  * SCALE.md.
  */
object StreamLoopProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val batchSize = args.lift(1).map(_.toInt).getOrElse(10000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet").persist()
    val n = docs.count()
    // ids are replica-shifted, not contiguous — take the top batchSize
    // ids as "today's batch" and everything else as seeded history
    val cut = docs.select(col("doc_id"))
      .orderBy(col("doc_id").desc).limit(batchSize)
      .agg(min(col("doc_id"))).head().getLong(0)
    val batchDocs = docs.filter(col("doc_id") >= cut).persist()
    val histDocs = docs.filter(col("doc_id") < cut)
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s " +
        f"(history=${n - batchSize}%d, batch=$batchSize%d)")
    }

    // media loop: image dHash over the gradient fixture
    val imageHasher: (org.apache.spark.sql.DataFrame, String) => org.apache.spark.sql.DataFrame =
      (df, id) => Multimodal.dHash64(
        Multimodal.withGradientImagePayload(df.select(id).repartition(32), id), id)
    val mIdx = tmp("slp_midx"); val mOut = tmp("slp_mlake")
    DocumentStreams.seedIndex(
      imageHasher(histDocs.select("doc_id"), "doc_id"), mIdx)
    // optional STAGE BREAKDOWN of the media batch (set
    // SPARK_GRAFT_PROBE_STAGES=1): isolates which component carries the
    // history-size dependence — the codec/hash stage is history-free by
    // construction, so any growth must live in the index read + probe
    // join, and the plan dump shows whether the batch side broadcasts
    // (history scanned, never shuffled) or the join degenerated to an
    // exchange of the exploded index
    if (sys.env.contains("SPARK_GRAFT_PROBE_STAGES")) {
      val hashed = imageHasher(batchDocs.select("doc_id"), "doc_id")
        .persist()
      timed("  media stage: hash batch")(hashed.count())
      val history = spark.read.parquet(mIdx).select("id", "sh").persist()
      timed("  media stage: read history index")(history.count())
      val probe = Dedup.incrementalHammingPairs(
        hashed.filter(col("sh").isNotNull), history, 3, excludeSelf = false)
      timed("  media stage: incremental probe")(probe.count())
      val plan = probe.queryExecution.executedPlan.toString
      println("  media probe join: " + (
        if (plan.contains("BroadcastHashJoin")) "BroadcastHashJoin (history scan-only)"
        else if (plan.contains("SortMergeJoin")) "SortMergeJoin (HISTORY SHUFFLES — regression)"
        else "other"))
      history.unpersist(); hashed.unpersist()
    }
    timed("media-loop batch")(MediaStreams.processMediaBatch(
      batchDocs.select("doc_id").withColumn("payload", lit(Array[Byte]())),
      // the pluggable hasher derives payloads from ids here, so the
      // carried payload column is inert — hashing cost is still real
      0L, "doc_id", imageHasher, mIdx, mOut, maxDistance = 3))

    // document loop: MinHash band index at the battery parameters
    val dIdx = tmp("slp_didx"); val dOut = tmp("slp_dlake")
    DocumentStreams.seedIndex(
      Dedup.minhashBandIndex(histDocs, "doc_id", "text", slimSigs = true), dIdx)
    timed("doc-loop batch")(DocumentStreams.processBatch(
      batchDocs.select("doc_id", "text"),
      0L, "doc_id", "text", dIdx, dOut, 3, 128, 32, 0.7))

    // embedding loop (round-17, probing the inlined 2-exchange batch
    // plan): FIXED 500-vector batch (the battery rows' contract) against
    // the seeded history of everything else — per-batch cost must track
    // the batch and its bucket collisions, not the history size, across
    // the sf0.1 → sf1 decade. Battery tuning: threshold 0.45, (3, 8, 42).
    val embDf = spark.read.parquet(s"$dir/embeddings.parquet").persist()
    val nE = embDf.count()
    val eCut = embDf.select(col("vec_id")).orderBy(col("vec_id").desc)
      .limit(500).agg(min(col("vec_id"))).head().getLong(0)
    val eBatch = embDf.filter(col("vec_id") >= eCut)
    val eIdx = tmp("slp_eidx"); val eOut = tmp("slp_elake")
    DocumentStreams.seedIndex(
      graft.operators.Dedup.embeddingLshIndex(
        embDf.filter(col("vec_id") < eCut), "vec_id", "embedding", 3, 8, 42L),
      eIdx)
    val t0e = System.nanoTime()
    graft.streaming.EmbeddingStreams.processEmbeddingBatch(
      eBatch, 0L, "vec_id", "embedding", eIdx, eOut, 0.45, 3, 8, 42L)
    println(f"embed-loop batch: ${(System.nanoTime() - t0e) / 1e9}%.1f s " +
      f"(history=${nE - 500}%d, batch=500)")

    // chunk-store loop (round-18): FIXED 250-blob batch against the
    // seeded (hash, length) chunk index of everything else — per-batch
    // cost must track the batch (payload synthesis + chunking + the
    // broadcast key probe), not the history chunk count, across the
    // sf0.01 → sf0.1 decade (250 → n−250 blobs of history). Battery
    // params: minSize 64, maskBits 6, maxSize 512. The seed is the raw
    // chunk table — the probe reads only (hash, length), so 'first'
    // pre-filtering is immaterial to its cost.
    val blobs = Multimodal.withGradientImagePayload(
      docs.select("doc_id").repartition(32), "doc_id")
    val cCut = docs.select(col("doc_id")).orderBy(col("doc_id").desc)
      .limit(250).agg(min(col("doc_id"))).head().getLong(0)
    val cIdx = tmp("slp_cidx"); val cStats = tmp("slp_cstats")
    DocumentStreams.seedIndex(
      Dedup.cdcChunkTable(blobs.filter(col("doc_id") < cCut),
        "doc_id", "payload", minSize = 64, maskBits = 6, maxSize = 512),
      cIdx)
    // stage breakdown (the media-stage discipline): which component
    // carries any history dependence — chunking is history-free by
    // construction, so growth must live in the index read or the
    // broadcast key probe
    if (sys.env.contains("SPARK_GRAFT_PROBE_STAGES")) {
      // the chunk stage's own counts — the shared timed() would print
      // the probe-level batchSize, misstating this stage's fixed 250
      def timedC(label: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime()
        f
        println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s " +
          f"(history=${n - 250}%d blobs, batch=250)")
      }
      val history = spark.read.parquet(cIdx).select("hash", "length")
        .persist()
      timedC("  chunk stage: read history index")(history.count())
      val batchChunks = Dedup.cdcChunkTable(
          blobs.filter(col("doc_id") >= cCut), "doc_id", "payload",
          minSize = 64, maskBits = 6, maxSize = 512)
        .persist()
      timedC("  chunk stage: chunk batch")(batchChunks.count())
      // releasable form: the non-releasable variant would leak its
      // internally persisted batch chunk table into the TIMED loop
      // measurement below (Dedup's own caller contract)
      val (probe, releaseChunks) = Dedup.incrementalCdcChunksReleasable(
        blobs.filter(col("doc_id") >= cCut), "doc_id", "payload",
        history, minSize = 64, maskBits = 6, maxSize = 512)
      timedC("  chunk stage: incremental probe")(probe.count())
      val plan = probe.queryExecution.executedPlan.toString
      println("  chunk probe join: " + (
        if (plan.contains("BroadcastHashJoin")) "BroadcastHashJoin (history scan-only)"
        else if (plan.contains("SortMergeJoin")) "SortMergeJoin (HISTORY SHUFFLES — regression)"
        else "other"))
      releaseChunks()
      history.unpersist(); batchChunks.unpersist()
    }
    val t0c = System.nanoTime()
    graft.streaming.ChunkStoreStreams.processChunkBatch(
      blobs.filter(col("doc_id") >= cCut), 0L, "doc_id", "payload",
      cIdx, cStats, minSize = 64, maskBits = 6, maxSize = 512)
    println(f"chunk-loop batch: ${(System.nanoTime() - t0c) / 1e9}%.1f s " +
      f"(history=${n - 250}%d blobs, batch=250)")

    spark.stop()
  }
}
