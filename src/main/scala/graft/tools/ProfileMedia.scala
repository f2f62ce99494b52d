package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profile of the multimodal fixture pipelines' stage costs at sf0.1. */
object ProfileMedia {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id")
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[p] $label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    for (_ <- 1 to 3) {
      t("img-gen")(graft.operators.Multimodal.withGradientImagePayload(docs, "doc_id")
        .write.mode("overwrite").format("noop").save())
      t("img-gen+hash")(graft.operators.Multimodal.dHash64(
        graft.operators.Multimodal.withGradientImagePayload(docs, "doc_id"), "doc_id")
        .write.mode("overwrite").format("noop").save())
      t("img-full")(graft.operators.Dedup.simhashPairsFromTable(
        graft.operators.Multimodal.dHash64(
          graft.operators.Multimodal.withGradientImagePayload(docs, "doc_id"), "doc_id")
          .filter(col("sh").isNotNull), 3)
        .write.mode("overwrite").format("noop").save())
      t("aud-gen")(graft.operators.Multimodal.withToneAudioPayload(docs, "doc_id")
        .write.mode("overwrite").format("noop").save())
      t("aud-gen+hash")(graft.operators.Multimodal.audioFingerprint64(
        graft.operators.Multimodal.withToneAudioPayload(docs, "doc_id"), "doc_id")
        .write.mode("overwrite").format("noop").save())
    }
    spark.stop()
  }
}
