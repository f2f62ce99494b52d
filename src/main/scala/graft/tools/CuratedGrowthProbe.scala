package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-20 growth probe for the curated-ingest loop: runs `nBatches`
  * micro-batches of [[graft.streaming.DocumentStreams.processCuratedBatch]]
  * (docs < 500 split doc_id % nBatches — the battery fixture generalized)
  * and prints, PER BATCH, the wall seconds, Spark job count, task count,
  * and the per-job names of the slowest jobs — so "per-batch cost grows
  * with batch number" (VERDICT r19 #1) is attributable to a specific
  * job class instead of a lump.
  *
  * args: [sfDir=/root/testdata/sf0.1] [nBatches=6] [verbose]
  */
object CuratedGrowthProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(6)
    val verbose = args.contains("verbose")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cfg = graft.BatteryUtil.curationCfg
    val docs = graft.Queries.table(spark, dir, "documents")
      .filter(col("doc_id") < 500)
    val grams = graft.operators.Curation.benchGramsFor(
      graft.Queries.table(spark, dir, "documents")
        .filter(col("doc_id") % 10 === 0),
      cacheKey = s"$dir/documents!benchgrams", "text")
    grams.count() // memo built off the per-batch clock

    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int, String)]()
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (String, Int)]()
    val stageMs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobStart.put(e.jobId, e.time)
        e.stageInfos.foreach(si =>
          stages.put(si.stageId,
            (si.name.takeWhile(_ != '\n').take(70), si.numTasks)))
        jobs.put(e.jobId, (0L, e.stageInfos.map(_.numTasks).sum,
          e.stageInfos.sortBy(_.stageId).lastOption
            .map(_.name.takeWhile(_ != '\n').take(60)).getOrElse("?"))): Unit
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val t0 = jobStart.getOrDefault(e.jobId, e.time)
        val (_, tk, nm) = jobs.getOrDefault(e.jobId, (0L, 0, "?"))
        jobs.put(e.jobId, (e.time - t0, tk, nm)): Unit
      }
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val ms = (for (a <- si.submissionTime; b <- si.completionTime)
          yield b - a).getOrElse(0L)
        stageMs.put(si.stageId, ms): Unit
      }
    }

    (0 until 2).foreach { pass =>
      println(s"== pass $pass (pass 0 warms JIT/codegen) ==")
      val base = graft.Queries.tempDir("graft_curgrowth")
      val exactP = s"$base/exact"; val bandP = s"$base/band"
      val outP = s"$base/out"; val metP = s"$base/metrics"
      (0 until nBatches).foreach { i =>
        jobs.clear(); jobStart.clear(); stages.clear(); stageMs.clear()
        spark.sparkContext.addSparkListener(listener)
        val w0 = System.nanoTime()
        graft.streaming.DocumentStreams.processCuratedBatch(
          docs.filter(col("doc_id") % nBatches === i), i.toLong,
          "doc_id", "text", cfg, exactP, bandP, outP,
          shingleSize = 3, numHashes = 128, bands = 32,
          decontamGrams = Some(grams), metricsPath = Some(metP))
        val wall = (System.nanoTime() - w0) / 1e9
        Thread.sleep(300)
        spark.sparkContext.removeSparkListener(listener)
        import scala.jdk.CollectionConverters._
        val js = jobs.asScala.toSeq
        println(f"batch $i%d: wall=$wall%.2f s jobs=${js.size}%d " +
          f"tasks=${js.map(_._2._2).sum}%d jobms=${js.map(_._2._1).sum}%d")
        if (verbose) {
          // per-stage-NAME rollup: which operator call sites own the tasks
          val byName = stages.asScala.toSeq.groupBy(_._2._1).map {
            case (nm, ss) => (nm, ss.size, ss.map(_._2._2).sum,
              ss.map(s => stageMs.getOrDefault(s._1, 0L)).sum)
          }.toSeq.sortBy(-_._4)
          byName.take(14).foreach { case (nm, cnt, tk, ms) =>
            println(f"    stages=$cnt%2d tasks=$tk%5d ms=$ms%5d  $nm%s")
          }
        }
      }
    }
    spark.stop()
  }
}
