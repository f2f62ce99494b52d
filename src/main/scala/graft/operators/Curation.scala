package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end pretraining curation pipeline, composed from the
  * library's operators — what "a user of this engine" actually runs over a
  * raw crawl:
  *
  *   scrub PII → language filter → quality filter → exact dedup →
  *   transitive near-dup removal → token-window chunking → budget packing
  *
  * Every stage is one of the individually oracle-gated operators; this
  * object only composes them (no new semantics), which is itself the point:
  * the whole pipeline stays declarative, so Catalyst sees through stage
  * boundaries (filters merge, projections prune) everywhere the operators
  * allow it.
  */
object Curation {

  final case class Config(
      keepLangs: Set[String] = Set("en"),
      minQuality: Double = 0.3,
      nearDupThreshold: Double = 0.7,
      chunkTokens: Int = 512,
      chunkStride: Int = 512,
      packBudgetTokens: Long = 4096L)

  /** Returns the packed training chunks: (doc_id, chunk_id, chunk_text,
    * n_tokens, pack_id).
    */
  def pretrainingPipeline(docs: DataFrame, idCol: String, textCol: String,
                          cfg: Config = Config()): DataFrame = {
    val scrubbed = docs.withColumn(textCol, TextFunctions.scrubPii(col(textCol)))
    val filtered = scrubbed
      .filter(TextFunctions.langId(col(textCol)).isin(cfg.keepLangs.toSeq: _*))
      .filter(TextFunctions.qualityScore(col(textCol)) >= cfg.minQuality)
    val exactDeduped = Dedup.exact(filtered, col(textCol), col(idCol))
    val nearDeduped = Dedup.dropNearDuplicateClusters(exactDeduped, idCol,
      Dedup.minhashPairs(exactDeduped, idCol, textCol,
        threshold = cfg.nearDupThreshold))
    val chunks = Chunking.chunkByTokens(nearDeduped, idCol, textCol,
        cfg.chunkTokens, cfg.chunkStride)
      .withColumnRenamed("chunk_text", "__text")
    // deterministic GLOBAL packing order = lexicographic (doc, chunk): the
    // composite-key prefix sum buckets on the doc id (~1000 docs/bucket) —
    // no fused numeric key, so arbitrary id magnitudes and chunk counts.
    Chunking.packByTokenBudget(chunks, Seq(idCol, "chunk_id"), "__text",
      cfg.packBudgetTokens, bucketSize = 1000L)
      .withColumnRenamed("__text", "chunk_text")
      .select(idCol, "chunk_id", "chunk_text", "n_tokens", "pack_id")
  }
}
