package graft.streaming

import graft.SparkSpec
import graft.operators.Search
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class SearchStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val p = java.nio.file.Files.createTempDirectory(name)
    java.nio.file.Files.delete(p)
    p.toString
  }

  private val corpus = Seq(
    (1L, "spark joins tables and spark shuffles data across the cluster"),
    (2L, "a vector index answers similarity queries over spark embeddings"),
    (3L, "customer orders arrive daily and the customer count grows"),
    (4L, "an unrelated note about gardening and the weather this week"),
    (5L, "spark spark spark everywhere in this tuning guide for spark"),
    (6L, "the vector of the customer profile is stored in a table")
  )

  test("streamed BM25 serve == scan path over the union corpus; retry idempotent") {
    val lenP = tmp("graft_bm_len"); val postP = tmp("graft_bm_post")
    val batches = corpus.grouped(2).zipWithIndex.toSeq
    batches.foreach { case (rows, i) =>
      SearchStreams.processBm25Batch(rows.toDF("doc_id", "text"), i.toLong,
        "doc_id", "text", lenP, postP)
    }
    val terms = Seq("spark", "vector", "customer")
    val got = SearchStreams.bm25TopKStreamed(spark, lenP, postP, terms, k = 10)
      .as[(Long, Long, Long, Long, Long, Double)].collect().sortBy(_._2).toSeq
    val expected = Search.bm25TopK(corpus.toDF("doc_id", "text"),
        "doc_id", "text", terms, k = 10)
      .as[(Long, Long, Long, Long, Long, Double)].collect().sortBy(_._2).toSeq
    assert(got == expected) // scores bit-equal: same formula, exact merged df/tf
    assert(got.size == 5)   // every matching doc ranked; doc 4 absent
    // retrying a committed batch changes nothing
    SearchStreams.processBm25Batch(batches(1)._1.toDF("doc_id", "text"), 1L,
      "doc_id", "text", lenP, postP)
    val retried = SearchStreams.bm25TopKStreamed(spark, lenP, postP, terms, k = 10)
      .as[(Long, Long, Long, Long, Long, Double)].collect().sortBy(_._2).toSeq
    assert(retried == expected)
  }

  test("streamed serve under a binding cap == the batch-built capped index") {
    val lenP = tmp("graft_bmc_len"); val postP = tmp("graft_bmc_post")
    // 'spark' appears in docs 1,2,5 plus 7 — four docs, cap 2: each batch
    // holds ≤ 2 of them (batch caps never bind) but the MERGED list must
    // re-cap to the global top-2 by (tf desc, id asc)
    val docs = corpus :+ (7L, "spark also appears here just once more")
    docs.grouped(2).zipWithIndex.foreach { case (rows, i) =>
      SearchStreams.processBm25Batch(rows.toDF("doc_id", "text"), i.toLong,
        "doc_id", "text", lenP, postP, maxPostings = 2)
    }
    val got = SearchStreams.bm25TopKStreamed(spark, lenP, postP,
        Seq("spark"), k = 10, maxPostings = 2)
      .as[(Long, Long, Long, Long, Long, Double)].collect().sortBy(_._2).toSeq
    val expected = Search.bm25TopKIndexed(
        Search.buildBm25Index(docs.toDF("doc_id", "text"), "doc_id", "text",
          maxPostings = 2),
        Seq("spark"), k = 10)
      .as[(Long, Long, Long, Long, Long, Double)].collect().sortBy(_._2).toSeq
    assert(got == expected)
    assert(got.size == 2) // capped candidate set
  }

  test("compactBm25: serve identical across compaction; marker recovery completes, never re-merges") {
    val lenP = tmp("graft_bmk_len"); val postP = tmp("graft_bmk_post")
    corpus.grouped(2).zipWithIndex.foreach { case (rows, i) =>
      SearchStreams.processBm25Batch(rows.toDF("doc_id", "text"), i.toLong,
        "doc_id", "text", lenP, postP)
    }
    val terms = Seq("spark", "vector", "customer")
    def serve = SearchStreams.bm25TopKStreamed(spark, lenP, postP, terms, k = 10)
      .as[(Long, Long, Long, Long, Long, Double)].collect().sortBy(_._2).toSeq
    val before = serve
    SearchStreams.compactBm25(spark, lenP, postP, uptoBatch = 1L, targetFiles = 1)
    assert(serve == before)
    // postings consolidated to {seed, batch 2}, ONE merged row per token
    // in the seed
    val post = spark.read.parquet(postP)
    assert(post.select("__batch_id").distinct().as[Long].collect().toSet ==
      Set(-1L, 2L))
    val seedTokens = post.filter(col("__batch_id") === -1L).select("token")
      .as[String].collect()
    assert(seedTokens.length == seedTokens.distinct.length)
    // full compaction → single partition, still identical serve
    SearchStreams.compactBm25(spark, lenP, postP, uptoBatch = 2L, targetFiles = 1)
    assert(serve == before)
    assert(spark.read.parquet(postP).select("__batch_id").distinct()
      .as[Long].collect().toSet == Set(-1L))
    // MARKER RECOVERY: simulate a crash that left the staged tmp and the
    // marker but deleted nothing — a rerun must replay the publish (seed
    // := tmp, delete range, clean up), not re-merge the already-merged
    // seed into a double-counted one
    SearchStreams.processBm25Batch(corpus.take(2).map { case (i, t) =>
        (i + 100L, t) }.toDF("doc_id", "text"), 3L,
      "doc_id", "text", lenP, postP)
    val afterB3 = serve
    val fs = new org.apache.hadoop.fs.Path(postP)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // stage what a crashed compactBm25(upto=3) would have staged
    val hAll = spark.read.parquet(postP).drop("__batch_id")
    val tmpDir = new org.apache.hadoop.fs.Path(postP + "__compact_tmp")
    hAll.write.parquet(tmpDir.toString) // raw rows, NOT merged: recovery must publish THESE
    val marker = new org.apache.hadoop.fs.Path(postP, "_COMPACTING_UPTO")
    val out = fs.create(marker, true)
    out.write("3".getBytes(java.nio.charset.StandardCharsets.UTF_8)); out.close()
    SearchStreams.compactBm25(spark, lenP, postP, uptoBatch = 3L)
    assert(!fs.exists(marker) && !fs.exists(tmpDir))
    assert(spark.read.parquet(postP).select("__batch_id").distinct()
      .as[Long].collect().toSet == Set(-1L))
    // the recovered index serves the same ranking (rows were staged
    // unmerged, so the seed holds per-batch rows — the serve-side merge
    // handles that shape by construction)
    assert(serve == afterB3)
  }

  test("ingestBm25 wires the loop end-to-end via MemoryStream") {
    implicit val sqlCtx = spark.sqlContext
    val lenP = tmp("graft_bms_len"); val postP = tmp("graft_bms_post")
    val mem = MemoryStream[(Long, String)]
    val q = SearchStreams.ingestBm25(mem.toDF().toDF("doc_id", "text"),
      "doc_id", "text", lenP, postP).start()
    try {
      mem.addData(corpus.take(3): _*); q.processAllAvailable()
      mem.addData(corpus.drop(3): _*); q.processAllAvailable()
    } finally q.stop()
    val got = SearchStreams.bm25TopKStreamed(spark, lenP, postP,
        Seq("customer"), k = 5)
      .select("id").as[Long].collect().toSet
    assert(got == Set(3L, 6L))
  }
}
