package graft.tools

import graft.Queries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for the curated-ingest loop (round-19): times each stage
  * of one [[graft.streaming.DocumentStreams.processCuratedBatch]]-shaped
  * batch separately (admission, scrub, exact dedup, band index, history
  * probes, in-batch pairing, decontamination, sinks) so the loop's cost is
  * attributable to a stage instead of a lump. Mirrors the battery row's
  * fixture (documents < 500, 3 batches, the q_curation config).
  */
object ProfileCurated {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFunctions
    import graft.operators.Dedup

    val cfg = graft.BatteryUtil.curationCfg
    def t[A](name: String)(f: => A): A = {
      val w0 = System.nanoTime()
      val r = f
      println(f"  $name%-28s ${(System.nanoTime() - w0) / 1e9}%7.2f s")
      r
    }

    val docs = Queries.table(spark, dir, "documents").filter(col("doc_id") < 500)
    val grams = t("benchGramsFor (memo build)") {
      graft.operators.Curation.benchGramsFor(
        Queries.table(spark, dir, "documents").filter(col("doc_id") % 10 === 0),
        cacheKey = s"$dir/documents!benchgrams", "text")
    }
    t("grams.count") { println("    grams rows=" + grams.count()) }

    (0 until 2).foreach { round =>
      println(s"== pass $round (pass 0 warms JIT/codegen) ==")
      val batch = docs.filter(col("doc_id") % 3 === 0)
      val admitted = batch.filter(
        TextFunctions.langQualityKeep(col("text"), cfg.keepLangs, cfg.minQuality))
      t("admission count") { admitted.count() }
      val scrubbed = admitted.withColumn("text", TextFunctions.scrubPii(col("text")))
      t("scrub count") { scrubbed.count() }
      val exactDeduped = Dedup.exact(scrubbed, col("text"), col("doc_id"))
        .withColumn("__th", xxhash64(col("text")))
      t("exact dedup count") { exactDeduped.count() }
      val fresh = exactDeduped
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("fresh persist count") { fresh.count() }
      val newIdx = Dedup.minhashBandIndex(fresh, "doc_id", "text",
          3, 128, 32, slimSigs = true)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("band index count") { newIdx.count() }
      val asIndex = Dedup.MinhashIndex(
        newIdx.filter(col("sig").isNotNull).select("id", "sig"),
        newIdx.select("id", "band", "bh"))
      val dupInBatch = Dedup.minhashPairsFromIndex(asIndex, 128,
        cfg.nearDupThreshold)
      t("in-batch pairs count") { dupInBatch.count() }
      val deduped = fresh.join(
        dupInBatch.select(col("id2").as("__drop")),
        fresh("doc_id") === col("__drop"), "left_anti")
      t("deduped count") { deduped.count() }
      val bad = graft.operators.Curation.contaminationHitsFromGrams(
          deduped, "doc_id", "text", grams, cfg.decontamNgram)
        .filter(col("n_hits") >= cfg.decontamMinHits)
      t("decontam hits count") { bad.count() }
      val out = Queries.tempDir("graft_profcur")
      t("write survivors") {
        deduped.drop("__th").withColumn("__batch_id", lit(0L))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("__batch_id").parquet(s"$out/out")
      }
      newIdx.unpersist(); fresh.unpersist()
    }

    // the REAL loop, per-batch timing (pass 1 warm), metrics off
    (0 until 2).foreach { pass =>
      println(s"== real loop pass $pass ==")
      val base = Queries.tempDir("graft_profloop")
      val exactP = s"$base/exact"; val bandP = s"$base/band"
      val outP = s"$base/out"; val metP = s"$base/metrics"
      (0 until 3).foreach { i =>
        t(s"batch $i") {
          graft.streaming.DocumentStreams.processCuratedBatch(
            docs.filter(col("doc_id") % 3 === i), i.toLong, "doc_id", "text",
            cfg, exactP, bandP, outP,
            shingleSize = 3, numHashes = 128, bands = 32,
            decontamGrams = Some(grams), metricsPath = None)
        }
      }
      // dissect a 4th batch (batch-2 content re-sent as batch 3: full
      // history shape) stage by stage
      println("== dissect batch 3 (vs 3-batch history) ==")
      val spark2 = spark
      val batch = docs.filter(col("doc_id") % 3 === 2)
      val admitted = batch.filter(
        TextFunctions.langQualityKeep(col("text"), cfg.keepLangs, cfg.minQuality))
      val scrubbed = admitted.withColumn("text", TextFunctions.scrubPii(col("text")))
      val exactDeduped = Dedup.exact(scrubbed, col("text"), col("doc_id"))
        .withColumn("__th", xxhash64(col("text")))
      t("  stage: exactDeduped") { exactDeduped.count() }
      def readHist(path: String) = spark2.read.parquet(path)
        .filter(col("__batch_id") =!= 3L)
      val fresh0 = exactDeduped.join(readHist(exactP),
        exactDeduped("__th") === col("th"), "left_anti")
      val fresh = fresh0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("  stage: fresh (exact-history anti)") { fresh.count() }
      val newIdx = Dedup.minhashBandIndex(fresh, "doc_id", "text",
          3, 128, 32, slimSigs = true)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("  stage: band index") { newIdx.count() }
      val asIndex = Dedup.MinhashIndex(
        newIdx.filter(col("sig").isNotNull).select("id", "sig"),
        newIdx.select("id", "band", "bh"))
      val history = readHist(bandP)
      val dupOfHistory = Dedup.incrementalNearDupsIndexed(
          asIndex, Dedup.MinhashIndex(
            history.filter(col("sig").isNotNull).select("id", "sig"),
            history.select("id", "band", "bh")),
          128, cfg.nearDupThreshold, excludeSelf = false)
        .select(col("new_id").as("__drop"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("  stage: history probe") { dupOfHistory.count() }
      val eligible = Dedup.MinhashIndex(
        asIndex.sigs.join(dupOfHistory, asIndex.sigs("id") === col("__drop"), "left_anti"),
        asIndex.bands.join(dupOfHistory, asIndex.bands("id") === col("__drop"), "left_anti"))
      val dupInBatch = Dedup.minhashPairsFromIndex(eligible, 128,
        cfg.nearDupThreshold)
      t("  stage: in-batch pairs") { dupInBatch.count() }
      val deduped = fresh.join(
        dupOfHistory.union(dupInBatch.select(col("id2").as("__drop"))),
        fresh("doc_id") === col("__drop"), "left_anti")
      t("  stage: deduped") { deduped.count() }
      val bad = graft.operators.Curation.contaminationHitsFromGrams(
          deduped, "doc_id", "text", grams, cfg.decontamNgram)
        .filter(col("n_hits") >= cfg.decontamMinHits)
      t("  stage: decontam") { bad.count() }
      val survivors = deduped.join(bad.select(col("id").as("__cdrop")),
          deduped("doc_id") === col("__cdrop"), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("  stage: survivors persist") { survivors.count() }
      def writePart(rows: org.apache.spark.sql.DataFrame, path: String): Unit =
        rows.withColumn("__batch_id", lit(3L))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("__batch_id").parquet(path)
      t("  stage: write out") { writePart(survivors.drop("__th"), outP) }
      t("  stage: write band idx") {
        writePart(newIdx.join(survivors.select(col("doc_id").as("__keep")),
          newIdx("id") === col("__keep"), "left_semi"), bandP)
      }
      t("  stage: write exact idx") {
        writePart(survivors.select(col("__th").as("th")), exactP)
      }
      survivors.unpersist(); dupOfHistory.unpersist()
      newIdx.unpersist(); fresh.unpersist()
    }
    spark.stop()
  }
}
