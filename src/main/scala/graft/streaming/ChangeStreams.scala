package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming lake maintenance over CHANGELOG streams — the incremental
  * twin of [[graft.operators.Lake.latestSnapshot]]: a mutable table's
  * upsert/delete log arrives as micro-batches and a current-state
  * snapshot parquet is kept continuously merged, so readers always see
  * last-write-wins state without ever replaying the full log.
  *
  * Tombstones PERSIST in the snapshot (with a `__del` marker): a delete
  * must keep winning against older updates that arrive in LATER
  * micro-batches (out-of-order logs are the norm — partitioned topics
  * guarantee per-key order at best, and late replays not even that).
  * [[readSnapshot]] is the consumer view with tombstones filtered.
  * Dropping tombstones whose version is older than every producer's
  * watermark is a retention policy the caller can run as a maintenance
  * job; the merge itself never needs it.
  *
  * Scale: each micro-batch costs ONE ObjectHashAggregate argmax over
  * (snapshot ∪ batch) — map-side partial, no per-key sort, a
  * million-update hot key reduces before the exchange (the
  * [[graft.operators.Lake.latestSnapshot]] argument) — plus a swap-safe
  * rewrite of the snapshot. That is the classic copy-on-write merge
  * cadence: amortize with batch triggers sized so the snapshot rewrite
  * (O(live keys)) dominates the log read (O(batch)), and compact/bucket
  * the snapshot by key so the union's aggregate reads co-partitioned
  * input.
  */
object ChangeStreams {

  /** Continuously merge a changelog stream into a snapshot parquet at
    * `snapshotPath`. `isDelete` marks tombstone rows; `versionCols`
    * must give each key a total order (e.g. `(ts, seq)`) or ties break
    * partitioning-dependently. Bootstraps from an absent snapshot.
    *
    * Optional `changeFeedPath`: each micro-batch ALSO appends its net
    * effect on the LIVE view — `(op ∈ insert/update/delete, row…,
    * __batch_id)` via [[graft.operators.Lake.diffSnapshots]] of the
    * before/after snapshots — the change-data-feed downstream
    * incremental consumers subscribe to instead of re-diffing
    * snapshots themselves. A batch of late rows that changes nothing
    * appends nothing.
    */
  def cdcSnapshotStream(changelog: DataFrame, keyCols: Seq[String],
                        versionCols: Seq[String], isDelete: Column,
                        snapshotPath: String,
                        changeFeedPath: Option[String] = None): DataStreamWriter[Row] =
    changelog.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      mergeBatch(batch, keyCols, versionCols, isDelete, snapshotPath,
        changeFeedPath, batchId)
    }

  /** One micro-batch of the merge loop (factored out so batch semantics
    * are testable without a streaming harness — the
    * [[DocumentStreams.processBatch]] convention).
    */
  private[graft] def mergeBatch(batch: DataFrame, keyCols: Seq[String],
                                    versionCols: Seq[String], isDelete: Column,
                                    snapshotPath: String,
                                    changeFeedPath: Option[String] = None,
                                    batchId: Long = -1L): Unit = {
    val spark = batch.sparkSession
    val dataCols = batch.columns.toSeq
    val marked = batch.withColumn("__is_del",
      coalesce(isDelete.cast("boolean"), lit(false)))
    val target = new org.apache.hadoop.fs.Path(snapshotPath)
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    val exists = fs.exists(target)
    val unioned =
      if (exists)
        spark.read.parquet(snapshotPath)
          .withColumnRenamed("__del", "__is_del")
          .select(marked.columns.map(col): _*)
          .union(marked)
      else marked
    val merged = graft.operators.Lake.latestSnapshot(
        unioned, keyCols, versionCols.map(col),
        isDelete = col("__is_del"), keepTombstones = true)
      .select(dataCols.map(col) :+ col("__del"): _*)
    // change feed: diff the LIVE views before/after, while the old
    // snapshot is still on disk (the swap below replaces it). The diff
    // must be DURABLE before the swap, not merely cached: persisted
    // blocks can be dropped (executor loss, memory pressure), and a
    // recompute after the rename would re-read snapshotPath — by then
    // the NEW snapshot — yielding a silently wrong/empty feed slice. So
    // the diff is staged to parquet and read back; the feed append below
    // consumes the staged files, whose contents can never change
    // underneath it.
    val feed = changeFeedPath.map { p =>
      val before =
        if (exists) readSnapshot(spark, snapshotPath)
        else spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(
            merged.drop("__del").schema.fields))
      // "_op", not "op": CDC changelogs routinely carry their own `op`
      // column through to the snapshot, and the feed must not collide.
      // includeBefore: feed consumers maintaining incremental aggregates
      // need the replaced row to retract it
      val d = graft.operators.Lake.diffSnapshots(
          before, merged.filter(!col("__del")).drop("__del"), keyCols,
          opCol = "_op", includeBefore = true)
        .withColumn("__batch_id", lit(batchId))
      val staging = new org.apache.hadoop.fs.Path(
        p.stripSuffix("/") + ".__feed_tmp")
      d.write.mode("overwrite").parquet(staging.toString)
      (spark.read.parquet(staging.toString), staging)
    }
    // swap-safe rewrite: the snapshot is both input and output of this
    // batch, so write aside and rename (the Lake.compact swap; rename is
    // atomic on HDFS/posix, copy-emulated on object stores)
    val tmp = new org.apache.hadoop.fs.Path(
      snapshotPath.stripSuffix("/") + ".__merge_tmp")
    merged.write.mode("overwrite").parquet(tmp.toString)
    val bak = new org.apache.hadoop.fs.Path(
      snapshotPath.stripSuffix("/") + ".__merge_old")
    fs.delete(bak, true)
    if (fs.exists(target))
      require(fs.rename(target, bak), s"could not move $snapshotPath aside")
    if (!fs.rename(tmp, target)) {
      fs.rename(bak, target)
      throw new IllegalStateException(
        s"could not move merged snapshot into $snapshotPath")
    }
    fs.delete(bak, true)
    feed.foreach { case (d, staging) =>
      // `d` reads the staged files, so this append is insulated from the
      // swap above. Empty diffs append nothing (a no-op batch must not
      // litter the feed with schema-only part files).
      changeFeedPath.foreach { p =>
        if (!d.isEmpty) d.write.mode("append").parquet(p)
      }
      staging.getFileSystem(spark.sessionState.newHadoopConf())
        .delete(staging, true)
    }
  }

  /** The consumer view of [[cdcSnapshotStream]]'s snapshot: live rows
    * only (tombstones filtered, marker dropped).
    */
  def readSnapshot(spark: SparkSession, snapshotPath: String): DataFrame = {
    val snap = spark.read.parquet(snapshotPath)
    snap.filter(!col("__del")).drop("__del")
  }

  /** INCREMENTAL VIEW MAINTENANCE: fold a change-feed slice into a
    * per-group (sum, count) aggregate table WITHOUT touching the base
    * snapshot — the reason the feed carries preimages. Each feed row
    * contributes its retraction-aware delta (insert `+v`, update
    * `+v − before.v`, delete `−before.v`; counts ±1/0), deltas reduce in
    * one map-side-combined aggregate, and ONE outer join against the
    * |groups|-row aggregate table applies them — groups whose counts
    * reach zero drop. Folding feed slices batch-by-batch equals the
    * direct groupBy over the final snapshot (spec-pinned), at the cost
    * of reading only the feed slice: O(changes), not O(table).
    *
    * Average/variance maintenance is the same shape with more moments;
    * MIN/MAX are NOT incrementally maintainable under deletes (a
    * retracted extremum forces a group re-scan) — recompute those, or
    * keep them approximately with a sketch.
    */
  def applyFeedToSums(agg: DataFrame, feed: DataFrame,
                      groupCols: Seq[String], valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val v = col(valueCol).cast("long")
    val before = col(s"_before.$valueCol").cast("long")
    val deltas = feed
      .select(groupCols.map(col) :+
        when(col("_op") === "insert", coalesce(v, lit(0L)))
          .when(col("_op") === "update",
            coalesce(v, lit(0L)) - coalesce(before, lit(0L)))
          .otherwise(-coalesce(before, lit(0L))).as("__dv") :+
        when(col("_op") === "insert", lit(1L))
          .when(col("_op") === "delete", lit(-1L))
          .otherwise(lit(0L)).as("__dn"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__dv")).as("__dv"), sum(col("__dn")).as("__dn"))
    val deltasR = groupCols.foldLeft(deltas)((d, c) =>
      d.withColumnRenamed(c, s"__g_$c"))
    val cond = groupCols.map(c => agg(c) <=> deltasR(s"__g_$c")).reduce(_ && _)
    agg.join(deltasR, cond, "full_outer")
      .select(groupCols.map(c => coalesce(agg(c), deltasR(s"__g_$c")).as(c)) ++ Seq(
        (coalesce(col("sum_v"), lit(0L)) + coalesce(col("__dv"), lit(0L)))
          .as("sum_v"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("__dn"), lit(0L))).as("n")): _*)
      .filter(col("n") > 0)
  }
}
