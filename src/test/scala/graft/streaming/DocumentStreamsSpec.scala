package graft.streaming

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class DocumentStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  test("streaming ingest-dedup drops history dups, in-batch dups, and cross-batch dups") {
    implicit val sqlCtx = spark.sqlContext
    val indexPath = tmp("graft_idx")
    val outPath = tmp("graft_lake")

    // history: 3 documents, index persisted up front (the nightly job)
    val history = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "completely unrelated text about spark query engines and distributed joins"),
      (3L, "another fully distinct document mentioning embeddings and similarity search")
    ).toDF("doc_id", "text")
    Dedup.minhashBandIndex(history, "doc_id", "text")
      .write.mode("overwrite").parquet(indexPath)

    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val q = DocumentStreams.ingestDedup(stream, "doc_id", "text",
      indexPath, outPath, threshold = 0.5).start()
    try {
      // batch 1: 10 ~ history doc 1 (dropped), 11 novel (kept),
      // 12 ~ 11 within the batch (dropped, larger id)
      mem.addData(
        (10L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
        (11L, "a brand new article describing winnowing fingerprints and rolling hashes"),
        (12L, "a brand new article describing winnowing fingerprints and rolling hash"))
      q.processAllAvailable()
      // batch 2: 20 ~ batch-1 survivor 11 (dropped — the index GREW),
      // 21 novel (kept)
      mem.addData(
        (20L, "a brand new article describing winnowing fingerprints and rolling hashes"),
        (21L, "entirely fresh content on bucketed joins and adaptive query execution"))
      q.processAllAvailable()
    } finally q.stop()

    val lake = spark.read.parquet(outPath)
    assert(lake.select("doc_id").as[Long].collect().toSet == Set(11L, 21L))
    // idempotence marker rides along
    assert(lake.columns.contains("__batch_id"))
    // the index holds exactly history + the two survivors
    val idxIds = spark.read.parquet(indexPath)
      .select("id").distinct().as[Long].collect().toSet
    assert(idxIds == Set(1L, 2L, 3L, 11L, 21L))
    // and probing it with yet another near-dup of 21 finds the collision
    val probe = Seq((30L, "entirely fresh content on bucketed joins and adaptive query executions"))
      .toDF("doc_id", "text")
    val hits = Dedup.incrementalNearDups(probe, "doc_id", "text",
        spark.read.parquet(indexPath), threshold = 0.5)
      .select("old_id").as[Long].collect().toSet
    assert(hits == Set(21L))
  }
}
