package graft.streaming

import graft.SparkSpec
import graft.operators.Multimodal
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class MediaStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  // gradient-image payloads for a set of ids (family = id div 4: variants
  // of one family are near-dups at Hamming <= 3; families are far)
  private def media(ids: Long*): DataFrame =
    Multimodal.withGradientImagePayload(ids.toDF("media_id"), "media_id")

  private val imageHasher: (DataFrame, String) => DataFrame =
    (df, id) => Multimodal.dHash64(df, id)

  test("streaming media ingest-dedup: history, in-batch, cross-batch, corrupt passthrough") {
    implicit val sqlCtx = spark.sqlContext
    val indexPath = tmp("graft_midx")
    val outPath = tmp("graft_mlake")

    // history: family 0 variants 0,1 already published (the nightly seed)
    DocumentStreams.seedIndex(
      imageHasher(media(0L, 1L), "media_id"), indexPath)

    val mem = MemoryStream[Long]
    val stream = mem.toDF().toDF("media_id")
      .transform(df => Multimodal.withGradientImagePayload(df, "media_id"))
    val q = MediaStreams.ingestMediaDedup(stream, "media_id", imageHasher,
      indexPath, outPath).start()
    try {
      // batch 1: 2,3 ~ history family 0 (dropped); 8 fresh family 2
      // (kept); 9 ~ 8 within the batch (dropped — larger id)
      mem.addData(2L, 3L, 8L, 9L)
      q.processAllAvailable()
      // batch 2: 10 ~ batch-1 survivor 8 (dropped — the index GREW);
      // 40 fresh family 10 (kept)
      mem.addData(10L, 40L)
      q.processAllAvailable()
    } finally q.stop()

    val lake = spark.read.parquet(outPath)
    assert(lake.select("media_id").as[Long].collect().toSet == Set(8L, 40L))
    // the hash index holds exactly history + survivors
    val idx = spark.read.parquet(indexPath)
    assert(idx.select("id").distinct().as[Long].collect().toSet ==
      Set(0L, 1L, 8L, 40L))

    // an UNDECODABLE payload passes through (published, NOT indexed)
    val corrupt = Seq((99L, "not an image".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    MediaStreams.processMediaBatch(corrupt, 7L, "media_id", imageHasher,
      indexPath, outPath, maxDistance = 3)
    assert(spark.read.parquet(outPath).filter(col("media_id") === 99L).count() == 1)
    assert(spark.read.parquet(indexPath).filter(col("id") === 99L).count() == 0)

    // foreachBatch RETRY idempotence: re-running a committed batch id
    // rewrites its own partitions, never duplicates
    MediaStreams.processMediaBatch(media(10L, 40L), 1L, "media_id",
      imageHasher, indexPath, outPath, maxDistance = 3)
    val lake2 = spark.read.parquet(outPath)
    assert(lake2.filter(col("media_id") === 40L).count() == 1)
    assert(lake2.select("media_id").as[Long].collect().toSet == Set(8L, 40L, 99L))
  }
}
