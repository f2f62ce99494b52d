package graft.tools

import graft.operators.{Dedup, Multimodal}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the incremental storage-dedup probe
  * ([[Dedup.incrementalCdcChunks]]) under the StreamLoopProbe
  * methodology: the BATCH is held fixed (the same 250 synthetic blobs at
  * every decade) while the history chunk index grows 10× per step, and
  * the timed run is the batch probe alone — the chunk index build is the
  * offline job. The claim under test is the plan shape: history is
  * SCANNED with the batch's distinct keys broadcast, never shuffled, so
  * per-batch cost must grow only with the linear index scan (µs/index
  * row flat), not with any history-sized exchange.
  *
  * Run: runMain graft.tools.CdcIncProbe [histSizes csv] [batchSize]
  */
object CdcIncProbe {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("500,5000,50000")
      .split(",").map(_.trim.toLong).toSeq
    val batchSize = args.lift(1).map(_.toLong).getOrElse(250L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // fixed batch: ids far above any history range, so batch content is
    // identical at every decade (payloads derive from the id alone)
    val batch = Multimodal.withGradientImagePayload(
      spark.range(10000000L, 10000000L + batchSize)
        .select(col("id").as("doc_id")).repartition(32), "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    batch.count()

    println("hist_docs index_rows probe_sec us_per_index_row stored hit dup")
    sizes.foreach { h =>
      val histBlobs = Multimodal.withGradientImagePayload(
        spark.range(h).select(col("id").as("doc_id")).repartition(32),
        "doc_id")
      val index = Dedup.cdcChunkTable(histBlobs, "doc_id", "payload",
          minSize = 64, maskBits = 6, maxSize = 512)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nIdx = index.count() // offline build, outside the timed probe

      var stats: org.apache.spark.sql.Row = null
      var sec = 0.0
      for (round <- 1 to 2) { // round 1 warms; round 2 is the number
        val t0 = System.nanoTime()
        val ann = Dedup.incrementalCdcChunks(batch, "doc_id", "payload",
          index, minSize = 64, maskBits = 6, maxSize = 512)
        stats = Dedup.cdcIngestStats(ann).head()
        sec = (System.nanoTime() - t0) / 1e9
      }
      println(f"$h%d $nIdx%d $sec%.3f ${sec * 1e6 / nIdx}%.3f " +
        s"${stats.getAs[Long]("stored_chunks")} " +
        s"${stats.getAs[Long]("hit_chunks")} ${stats.getAs[Long]("dup_chunks")}")
      index.unpersist()
      spark.catalog.clearCache()
      batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      batch.count()
    }
    spark.stop()
  }
}
