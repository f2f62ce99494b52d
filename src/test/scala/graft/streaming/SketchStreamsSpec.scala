package graft.streaming

import graft.SparkSpec
import graft.operators.Profile
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Pins the streaming sketch loops' defining property — the served sketch
  * is BIT-IDENTICAL to the offline sketch of the concatenated data, at
  * every batch count and across compaction — plus retry idempotence and
  * the counter-family's marker-guarded compaction.
  */
class SketchStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  private def docs(n: Int): DataFrame =
    (1 to n).map(i => (i.toLong, s"key${i % 700}", s"s${i % 3}"))
      .toDF("id", "k", "slice")

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("KMV loop: served sketch equals the offline sketch after every batch") {
    val path = tmp("graft_kmvs")
    val d = docs(900)
    (0 until 3).foreach { i =>
      SketchStreams.processKmvBatch(
        d.filter(col("id") % 3 === i), i.toLong, col("k"), 32, path, Seq("slice"))
      val upto = d.filter(col("id") % 3 <= i)
      assert(sortedRows(SketchStreams.serveKmv(spark, path, 32, Seq("slice"))) ==
        sortedRows(Profile.kmvSketch(upto, col("k"), 32, Seq("slice"))))
    }
  }

  test("KMV loop: batch retry rewrites its own partition; serve unchanged") {
    val path = tmp("graft_kmvr")
    val d = docs(600)
    SketchStreams.processKmvBatch(d.filter(col("id") % 2 === 0), 0L,
      col("k"), 16, path, Nil)
    SketchStreams.processKmvBatch(d.filter(col("id") % 2 === 1), 1L,
      col("k"), 16, path, Nil)
    val before = sortedRows(SketchStreams.serveKmv(spark, path, 16))
    // at-least-once redelivery of batch 1
    SketchStreams.processKmvBatch(d.filter(col("id") % 2 === 1), 1L,
      col("k"), 16, path, Nil)
    assert(sortedRows(SketchStreams.serveKmv(spark, path, 16)) == before)
  }

  test("KMV compaction re-mins into the seed; serve and overlap unchanged") {
    val path = tmp("graft_kmvc")
    val d = docs(900)
    (0 until 4).foreach { i =>
      SketchStreams.processKmvBatch(
        d.filter(col("id") % 4 === i), i.toLong, col("k"), 32, path, Nil)
    }
    val before = sortedRows(SketchStreams.serveKmv(spark, path, 32))
    SketchStreams.compactKmv(spark, path, 32, uptoBatch = 2L)
    assert(sortedRows(SketchStreams.serveKmv(spark, path, 32)) == before)
    // consolidated: seed + batch 3 only, seed holds ONE <=k sketch
    val ids = spark.read.parquet(path).select("__batch_id").distinct()
      .as[Long].collect().sorted.toSeq
    assert(ids == Seq(-1L, 3L))
    assert(spark.read.parquet(path).filter(col("__batch_id") === -1L)
      .count() <= 32L)
  }

  test("CMS loop: served counters equal the offline sketch; estimates identical") {
    val path = tmp("graft_cmss")
    val d = docs(900)
    (0 until 3).foreach { i =>
      SketchStreams.processCmsBatch(
        d.filter(col("id") % 3 === i), i.toLong, col("k"), 3, 32, path, Seq("slice"))
    }
    val served = SketchStreams.serveCms(spark, path, Seq("slice"))
    val offline = Profile.cmsSketch(d, col("k"), 3, 32, Seq("slice"))
    assert(sortedRows(served) == sortedRows(offline))
    val estS = Profile.cmsEstimate(served, Seq("key1", "key699"), 3, 32, Seq("slice"))
    val estO = Profile.cmsEstimate(offline, Seq("key1", "key699"), 3, 32, Seq("slice"))
    assert(sortedRows(estS) == sortedRows(estO))
  }

  test("CMS compaction is marker-guarded and exact; a crashed publish resumes") {
    val path = tmp("graft_cmsc")
    val d = docs(600)
    (0 until 3).foreach { i =>
      SketchStreams.processCmsBatch(
        d.filter(col("id") % 3 === i), i.toLong, col("k"), 3, 32, path, Nil)
    }
    val before = sortedRows(SketchStreams.serveCms(spark, path))
    SketchStreams.compactCms(spark, path, uptoBatch = 1L)
    assert(sortedRows(SketchStreams.serveCms(spark, path)) == before)
    val ids = spark.read.parquet(path).select("__batch_id").distinct()
      .as[Long].collect().sorted.toSeq
    assert(ids == Seq(-1L, 2L))
    // simulate a crash AFTER staging + marker, BEFORE publish: a re-run
    // must complete the interrupted compaction, not double-count
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmpDir = new org.apache.hadoop.fs.Path(path + "__compact_tmp")
    val merged = SketchStreams.serveCms(spark, path)
    merged.coalesce(1).write.parquet(tmpDir.toString)
    val out = fs.create(new org.apache.hadoop.fs.Path(path, "_COMPACTING_UPTO"), true)
    try out.write("2".getBytes("UTF-8")) finally out.close()
    SketchStreams.compactCms(spark, path, uptoBatch = 2L)
    assert(sortedRows(SketchStreams.serveCms(spark, path)) == before)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path, "_COMPACTING_UPTO")))
  }

  test("quantile loop: served sketch exact; rank estimates match offline") {
    val path = tmp("graft_qss")
    val vals = (1 to 800).map(i => (i.toLong, (i % 512).toLong)).toDF("id", "v")
    (0 until 2).foreach { i =>
      SketchStreams.processQuantileBatch(
        vals.filter(col("id") % 2 === i), i.toLong, col("v"), 10, 3, 32, path, Nil)
    }
    val served = SketchStreams.serveQuantileSketch(spark, path)
    val offline = Profile.quantileSketch(vals, col("v"), 10, 3, 32)
    assert(sortedRows(served) == sortedRows(offline))
    val rs = Profile.quantileRank(served, Seq(100L, 300L), 10, 3, 32)
    val ro = Profile.quantileRank(offline, Seq(100L, 300L), 10, 3, 32)
    assert(sortedRows(rs) == sortedRows(ro))
    SketchStreams.compactQuantileSketch(spark, path, uptoBatch = 1L)
    assert(sortedRows(SketchStreams.serveQuantileSketch(spark, path)) ==
      sortedRows(offline))
  }

  test("KMV novelty stats: day-one before=0, repeat-content batch reads est_new=0, retry idempotent") {
    val base = java.nio.file.Files.createTempDirectory("graft_kmvnovspec").toString
    val skPath = s"$base/sk"; val stPath = s"$base/stats"
    val fresh = (1 to 400).map(i => s"key$i").toDF("k")
    val repeat = (1 to 200).map(i => s"key$i").toDF("k") // all seen in batch 0
    SketchStreams.processKmvBatch(fresh, 0L, col("k"), 32, skPath, Nil, Some(stPath))
    SketchStreams.processKmvBatch(repeat, 1L, col("k"), 32, skPath, Nil, Some(stPath))
    val stats = spark.read.parquet(stPath)
      .select(col("__batch_id").cast("long"), col("batch_kept"),
        col("est_before"), col("est_after"), col("est_new"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    assert(stats.head._3 == 0L) // day one: before = 0
    assert(stats.head._5 == stats.head._4) // new = after
    assert(stats(1)._5 == 0L, s"repeat batch must read 0 new, got ${stats(1)}")
    assert(stats(1)._2 == 32L) // batch sketch still bounded at k
    // at-least-once retry of batch 1: identical row, no duplicate
    SketchStreams.processKmvBatch(repeat, 1L, col("k"), 32, skPath, Nil, Some(stPath))
    val again = spark.read.parquet(stPath)
      .select(col("__batch_id").cast("long"), col("batch_kept"),
        col("est_before"), col("est_after"), col("est_new"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    assert(again == stats)
  }

  test("KMV loop end to end over a MemoryStream") {
    implicit val sqlCtx = spark.sqlContext
    val path = tmp("graft_kmvm")
    val mem = MemoryStream[Long]
    val stream = mem.toDF().toDF("id")
      .withColumn("k", concat(lit("key"), (col("id") % 300).cast("string")))
    val writer = SketchStreams.ingestKmv(stream, col("k"), 16, path)
      .option("checkpointLocation", tmp("graft_kmvm_ck"))
    val q = writer.start()
    try {
      mem.addData(1L to 400L: _*)
      q.processAllAvailable()
      mem.addData(401L to 800L: _*)
      q.processAllAvailable()
    } finally q.stop()
    val want = (1L to 800L).map(i => s"key${i % 300}").toDF("k")
    assert(sortedRows(SketchStreams.serveKmv(spark, path, 16)) ==
      sortedRows(Profile.kmvSketch(want, col("k"), 16)))
  }
}
