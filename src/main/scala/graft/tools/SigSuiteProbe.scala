package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession

/** Measures the one-scan signature-suite build
  * ([[Dedup.signatureSuiteFor]]) against the four standalone family
  * builds on the same corpus — the nightly-index-job comparison. Builds
  * are forced by counting every produced artifact (the writes happen
  * inside the memos). Keys are probe-unique so every build is real.
  *
  * args: [sfDir] [orderFlip] — orderFlip = "flip" runs standalone first
  * (JIT/codegen warm-up otherwise favors whichever goes second; run both
  * orders and read the pair).
  */
object SigSuiteProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val flip = args.lift(1).contains("flip")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    def standalone(): Unit = timed("standalone x4") {
      Dedup.minhashIndexFor(docs, "probe!alone!mh", "doc_id", "text").bands.count() +
        Dedup.ngramSetsFor(docs, "probe!alone!ng", "doc_id", "text").count() +
        Dedup.simhashTableFor(docs, "probe!alone!sim", "doc_id", "text").count() +
        Dedup.winnowPostingsFor(docs, "probe!alone!win", "doc_id", "text").count()
    }
    def suite(): Unit = timed("suite one-scan") {
      val s = Dedup.signatureSuiteFor(docs, "probe!suite!mh", "probe!suite!ng",
        "probe!suite!sim", "probe!suite!win", "doc_id", "text")
      s.minhash.bands.count() + s.ngramSets.count() + s.simhash.count() +
        s.winnowPostings.count()
    }
    if (flip) { standalone(); suite() } else { suite(); standalone() }
    spark.stop()
  }
}
