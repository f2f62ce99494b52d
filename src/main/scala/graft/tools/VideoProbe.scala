package graft.tools

import graft.operators.{Dedup, Multimodal}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object VideoProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label: $n%d rows in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").repartition(32)
    val vids = Multimodal.withVideoPayload(ids, "doc_id", nFrames = 8)
    timed("payload-only")(vids.select(octet_length(col("payload"))).agg(sum(lit(1))).head().getLong(0))
    val fh = Multimodal.videoFrameHashes(vids, "doc_id", everyNth = 2)
      .filter(col("sh").isNotNull)
    timed("frame-hashes")(fh.count())
    val fhP = fh.persist()
    timed("frame-hashes-persisted")(fhP.count())
    timed("aligned-pairs-from-persisted")(
      Dedup.alignedHammingPairs(
        fhP.select(col("id"), col("frame_idx").as("pos"), col("sh")), 3).count())
    timed("full-videoNearDupPairs")(
      Multimodal.videoNearDupPairs(vids, "doc_id", everyNth = 2).count())
    spark.stop()
  }
}
