package graft.streaming

import graft.SparkSpec
import graft.operators.Lake
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class ChangeStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  // changelog rows: (key, value, version, op)
  private val b1 = Seq(
    ("a", 10L, 1L, "upsert"),
    ("a", 11L, 2L, "upsert"),   // in-batch LWW: v2 wins
    ("b", 20L, 1L, "upsert"),
    ("c", 30L, 1L, "upsert"))
  private val b2 = Seq(
    ("b", 0L, 3L, "delete"),    // tombstone for b
    ("c", 31L, 2L, "upsert"),   // cross-batch update
    ("d", 40L, 1L, "upsert"))
  private val b3 = Seq(
    ("b", 22L, 2L, "upsert"),   // LATE, older than b's tombstone: stays dead
    ("a", 9L, 1L, "upsert"))    // late, older than a's v2: ignored

  test("cdcSnapshotStream: LWW across batches, tombstones beat late rows") {
    implicit val sqlCtx = spark.sqlContext
    val snapPath = tmp("graft_snap") + "/snap"
    val mem = MemoryStream[(String, Long, Long, String)]
    val stream = mem.toDF().toDF("k", "v", "ver", "op")
    val q = ChangeStreams.cdcSnapshotStream(stream, Seq("k"), Seq("ver"),
      isDelete = col("op") === "delete", snapPath).start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()

    val got = ChangeStreams.readSnapshot(spark, snapPath)
      .select("k", "v", "ver").as[(String, Long, Long)].collect().toSet
    assert(got == Set(("a", 11L, 2L), ("c", 31L, 2L), ("d", 40L, 1L)))
    // the tombstone row itself persists in the raw snapshot
    val raw = spark.read.parquet(snapPath)
    assert(raw.filter(col("__del")).select("k").as[String].collect().toSeq
      == Seq("b"))
  }

  test("change feed: per-batch net effect on the live view, silent when nothing changes") {
    val root = tmp("graft_snap_cdf")
    val snapPath = root + "/snap"
    val feedPath = root + "/feed"
    for ((b, id) <- Seq(b1, b2, b3).zipWithIndex) {
      ChangeStreams.mergeBatch(b.toDF("k", "v", "ver", "op"), Seq("k"),
        Seq("ver"), col("op") === "delete", snapPath,
        changeFeedPath = Some(feedPath), batchId = id.toLong)
    }
    val feed = spark.read.parquet(feedPath)
      .select("__batch_id", "_op", "k", "v", "ver")
      .as[(Long, String, String, Long, Long)].collect().toSet
    assert(feed == Set(
      // batch 0 bootstraps: every surviving key is an insert
      (0L, "insert", "a", 11L, 2L),
      (0L, "insert", "b", 20L, 1L),
      (0L, "insert", "c", 30L, 1L),
      // batch 1: b tombstoned, c updated, d inserted
      (1L, "delete", "b", 20L, 1L),
      (1L, "update", "c", 31L, 2L),
      (1L, "insert", "d", 40L, 1L)
      // batch 2 (late losers only) appends NOTHING
    ))
    // an INCREMENTAL AGGREGATE maintained from the feed alone equals the
    // direct aggregate over the final snapshot: apply +v on insert,
    // +v − before.v on update, −before.v on delete — retraction is
    // exactly what the preimage column exists for
    val delta = spark.read.parquet(feedPath)
      .select(
        when(col("_op") === "insert", col("v"))
          .when(col("_op") === "update", col("v") - col("_before.v"))
          .otherwise(-col("_before.v")).as("d"))
      .agg(sum(col("d"))).as[Long].head()
    val direct = ChangeStreams.readSnapshot(spark, snapPath)
      .agg(sum(col("v"))).as[Long].head()
    assert(delta == direct)
  }

  test("applyFeedToSums: batch-by-batch fold == direct aggregate; empty groups drop") {
    val root = tmp("graft_ivm")
    val snapPath = root + "/snap"
    val feedPath = root + "/feed"
    for ((b, id) <- Seq(b1, b2, b3).zipWithIndex) {
      ChangeStreams.mergeBatch(b.toDF("k", "v", "ver", "op"), Seq("k"),
        Seq("ver"), col("op") === "delete", snapPath,
        changeFeedPath = Some(feedPath), batchId = id.toLong)
    }
    // group by first letter class: 'a'..'c' vs 'd' — use the key itself
    val feed = spark.read.parquet(feedPath)
    val empty = Seq.empty[(String, Long, Long)].toDF("k", "sum_v", "n")
    val folded = (0L until 3L).foldLeft(empty) { (agg, id) =>
      ChangeStreams.applyFeedToSums(agg,
        feed.filter(col("__batch_id") === id), Seq("k"), "v")
    }.as[(String, Long, Long)].collect().toSet
    val direct = ChangeStreams.readSnapshot(spark, snapPath)
      .groupBy("k").agg(sum(col("v")).as("sum_v"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect().toSet
    assert(folded == direct && folded.nonEmpty)
    // the tombstoned key 'b' is GONE from the maintained table, not a
    // zero-count residue
    assert(!folded.exists(_._1 == "b"))
  }

  test("incremental merge == batch latestSnapshot over the whole log") {
    val snapPath = tmp("graft_snap2") + "/snap"
    for (b <- Seq(b1, b2, b3)) {
      ChangeStreams.mergeBatch(b.toDF("k", "v", "ver", "op"), Seq("k"),
        Seq("ver"), col("op") === "delete", snapPath)
    }
    val incremental = ChangeStreams.readSnapshot(spark, snapPath)
      .select("k", "v", "ver").as[(String, Long, Long)].collect().toSet
    val batch = Lake.latestSnapshot((b1 ++ b2 ++ b3).toDF("k", "v", "ver", "op"),
        Seq("k"), Seq(col("ver")), isDelete = col("op") === "delete")
      .select("k", "v", "ver").as[(String, Long, Long)].collect().toSet
    assert(incremental == batch)
  }

  test("mergeBatch bootstraps from an absent snapshot") {
    val snapPath = tmp("graft_snap3") + "/snap"
    ChangeStreams.mergeBatch(b1.toDF("k", "v", "ver", "op"), Seq("k"),
      Seq("ver"), col("op") === "delete", snapPath)
    val got = ChangeStreams.readSnapshot(spark, snapPath)
      .select("k", "v").as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 11L, "b" -> 20L, "c" -> 30L))
  }

  // key's first char partitions the snapshot — a pure function of the key,
  // per the mergeBatch caller contract
  private val byFirstChar = ("kpart", substring(col("k"), 1, 1))

  test("partitioned merge == unpartitioned merge: snapshot, tombstones, feed") {
    val root = tmp("graft_snap_part")
    val (flatSnap, flatFeed) = (root + "/flat", root + "/flatfeed")
    val (partSnap, partFeed) = (root + "/part", root + "/partfeed")
    for ((b, id) <- Seq(b1, b2, b3).zipWithIndex) {
      ChangeStreams.mergeBatch(b.toDF("k", "v", "ver", "op"), Seq("k"),
        Seq("ver"), col("op") === "delete", flatSnap,
        changeFeedPath = Some(flatFeed), batchId = id.toLong)
      ChangeStreams.mergeBatch(b.toDF("k", "v", "ver", "op"), Seq("k"),
        Seq("ver"), col("op") === "delete", partSnap,
        changeFeedPath = Some(partFeed), batchId = id.toLong,
        snapshotPartition = Some(byFirstChar))
    }
    def liveSet(p: String) =
      ChangeStreams.readSnapshot(spark, p, partitionCol = Some("kpart"))
        .select("k", "v", "ver").as[(String, Long, Long)].collect().toSet
    assert(liveSet(partSnap) == liveSet(flatSnap))
    // tombstone persists inside its partition
    val raw = spark.read.parquet(partSnap)
    assert(raw.filter(col("__del")).select("k").as[String].collect().toSeq
      == Seq("b"))
    def feedSet(p: String) = spark.read.parquet(p)
      .select("__batch_id", "_op", "k", "v", "ver")
      .as[(Long, String, String, Long, Long)].collect().toSet
    assert(feedSet(partFeed) == feedSet(flatFeed) && feedSet(partFeed).nonEmpty)
  }

  test("partitioned merge rewrites ONLY the touched partitions") {
    val snapPath = tmp("graft_snap_prune") + "/snap"
    ChangeStreams.mergeBatch(b1.toDF("k", "v", "ver", "op"), Seq("k"),
      Seq("ver"), col("op") === "delete", snapPath,
      snapshotPartition = Some(byFirstChar))
    def partFiles(part: String): Set[(String, Long)] = {
      val dir = new java.io.File(s"$snapPath/kpart=$part")
      if (!dir.exists()) Set.empty
      else dir.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified())).toSet
    }
    val (a0, b0, c0) = (partFiles("a"), partFiles("b"), partFiles("c"))
    assert(a0.nonEmpty && b0.nonEmpty && c0.nonEmpty)
    // batch touching only key "a": partitions b and c must be byte-for-
    // byte untouched (same files, same mtimes); a is rewritten
    ChangeStreams.mergeBatch(
      Seq(("a", 99L, 5L, "upsert")).toDF("k", "v", "ver", "op"), Seq("k"),
      Seq("ver"), col("op") === "delete", snapPath,
      snapshotPartition = Some(byFirstChar))
    assert(partFiles("b") == b0 && partFiles("c") == c0)
    assert(partFiles("a") != a0)
    val got = ChangeStreams.readSnapshot(spark, snapPath, Some("kpart"))
      .select("k", "v").as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 99L, "b" -> 20L, "c" -> 30L))
  }

  test("partition values that defeat type inference round-trip exactly") {
    // "00" infers back as int 0 under partition-column type inference, so
    // a path-only string comparison would miss the directory while dynamic
    // overwrite still replaces it — dropping the partition's other keys.
    // The merge reads with an explicit string schema, so "00" stays "00".
    val snapPath = tmp("graft_snap_infer") + "/snap"
    val part = ("kpart",
      when(col("k").startsWith("n"), lit("00"))
        .otherwise(substring(col("k"), 1, 1)))
    ChangeStreams.mergeBatch(
      Seq(("n1", 10L, 1L, "upsert"), ("n2", 11L, 1L, "upsert"),
        ("a1", 20L, 1L, "upsert"), ("b1", 30L, 1L, "upsert"),
        ("c1", 40L, 1L, "upsert"), ("01", 50L, 1L, "upsert"))
        .toDF("k", "v", "ver", "op"),
      Seq("k"), Seq("ver"), col("op") === "delete", snapPath,
      snapshotPartition = Some(part))
    assert(new java.io.File(s"$snapPath/kpart=00").exists())
    // touch ONLY partition "00" (1 of 5 — pruned path, not degenerate):
    // n2's prior version must be read into the merge and survive
    ChangeStreams.mergeBatch(
      Seq(("n1", 99L, 2L, "upsert")).toDF("k", "v", "ver", "op"),
      Seq("k"), Seq("ver"), col("op") === "delete", snapPath,
      snapshotPartition = Some(part))
    val got = ChangeStreams.readSnapshot(spark, snapPath, Some("kpart"))
      .select("k", "v").as[(String, Long)].collect().toMap
    assert(got == Map("n1" -> 99L, "n2" -> 11L, "a1" -> 20L,
      "b1" -> 30L, "c1" -> 40L, "01" -> 50L))
  }

  test("null and empty partition values route through the default partition") {
    val snapPath = tmp("graft_snap_null") + "/snap"
    val part = ("kpart",
      when(col("k").startsWith("z"), lit(null).cast("string"))
        .when(col("k").startsWith("e"), lit(""))
        .otherwise(substring(col("k"), 1, 1)))
    ChangeStreams.mergeBatch(
      Seq(("zed", 1L, 1L, "upsert"), ("emp", 2L, 1L, "upsert"),
        ("a1", 3L, 1L, "upsert"), ("b1", 4L, 1L, "upsert"),
        ("c1", 5L, 1L, "upsert")).toDF("k", "v", "ver", "op"),
      Seq("k"), Seq("ver"), col("op") === "delete", snapPath,
      snapshotPartition = Some(part))
    // update a NULL-partition key (1 of 4 dirs — pruned path): the default
    // partition's OTHER resident (empty-string-valued "emp") must be read
    // into the merge and survive the directory rewrite
    ChangeStreams.mergeBatch(
      Seq(("zed", 9L, 2L, "upsert")).toDF("k", "v", "ver", "op"),
      Seq("k"), Seq("ver"), col("op") === "delete", snapPath,
      snapshotPartition = Some(part))
    val got = ChangeStreams.readSnapshot(spark, snapPath, Some("kpart"))
      .select("k", "v").as[(String, Long)].collect().toMap
    assert(got == Map("zed" -> 9L, "emp" -> 2L, "a1" -> 3L,
      "b1" -> 4L, "c1" -> 5L))
  }

  test("degenerate batch (touches >= half the partitions) merges the full table, same result") {
    val root = tmp("graft_snap_degen")
    val (flatSnap, partSnap) = (root + "/flat", root + "/part")
    for (b <- Seq(b1, b2 /* touches 3 of 3 partitions -> degenerate */, b3)) {
      ChangeStreams.mergeBatch(b.toDF("k", "v", "ver", "op"), Seq("k"),
        Seq("ver"), col("op") === "delete", flatSnap)
      ChangeStreams.mergeBatch(b.toDF("k", "v", "ver", "op"), Seq("k"),
        Seq("ver"), col("op") === "delete", partSnap,
        snapshotPartition = Some(byFirstChar))
    }
    def liveSet(p: String, pc: Option[String]) =
      ChangeStreams.readSnapshot(spark, p, pc)
        .select("k", "v", "ver").as[(String, Long, Long)].collect().toSet
    assert(liveSet(partSnap, Some("kpart")) == liveSet(flatSnap, None))
    // the layout is still partitioned afterwards (later merges depend on it)
    assert(new java.io.File(partSnap).listFiles()
      .exists(f => f.isDirectory && f.getName.startsWith("kpart=")))
  }

  test("partitioned merge retry is idempotent") {
    val snapPath = tmp("graft_snap_retry") + "/snap"
    for (b <- Seq(b1, b2, b2 /* replay */, b3)) {
      ChangeStreams.mergeBatch(b.toDF("k", "v", "ver", "op"), Seq("k"),
        Seq("ver"), col("op") === "delete", snapPath,
        snapshotPartition = Some(byFirstChar))
    }
    val got = ChangeStreams.readSnapshot(spark, snapPath, Some("kpart"))
      .select("k", "v", "ver").as[(String, Long, Long)].collect().toSet
    assert(got == Set(("a", 11L, 2L), ("c", 31L, 2L), ("d", 40L, 1L)))
  }
}
