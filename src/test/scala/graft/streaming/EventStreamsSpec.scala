package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  /** 2024-01-01 10:00:00 UTC + `minute` minutes. */
  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  private val events = Seq(
    Event(1L, ts(0), 1L, "click", 1.0),
    Event(2L, ts(5), 1L, "click", 2.0),
    Event(3L, ts(50), 1L, "view", 3.0), // >30min gap -> new session
    Event(4L, ts(0), 2L, "click", 4.0),
    Event(5L, ts(65), 2L, "click", 5.0) // crosses hour window too
  )

  test("windowedStatsStream over a MemoryStream matches the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(events: _*)
    val q = EventStreams.windowedStatsStream(mem.toDF())
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("win_out")
      .select("h", "event_type", "cnt", "sum_value")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    val batch = EventStreams.windowedStatsBatch(events.toDF())
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("file-source streaming over the real events parquet matches batch") {
    val batchEvents = graft.Queries.events(spark, sf())
    // the file stream source requires a DIRECTORY; stage a symlink
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"),
      java.nio.file.Paths.get(sf() + "/events.parquet"))
    // same unit-detecting reader as the batch path (nanos and micros
    // source files both land on a micros TIMESTAMP ts)
    val stream = graft.Queries.eventsStream(spark, dir.toString)
    val q = EventStreams.windowedStatsStream(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("file_win_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("file_win_out")
      .select("h", "event_type", "cnt", "sum_value")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    val batch = EventStreams.windowedStatsBatch(batchEvents)
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("dedupStream drops replayed events — even retransmissions with a DIFFERENT ts") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    // replay event 1 verbatim and event 2 with a shifted retransmission ts
    mem.addData(events ++ Seq(events.head, events(1).copy(ts = ts(7))): _*)
    val q = EventStreams.dedupStream(mem.toDF(), Seq("event_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try q.processAllAvailable() finally q.stop()
    val ids = spark.table("dedup_out").select("event_id").as[Long].collect().toSeq
    assert(ids.sorted == events.map(_.event_id).sorted)
  }

  test("sessionizeStream rejects EventTimeTimeout up front (runtime-unsupported)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val e = intercept[IllegalArgumentException](
      EventStreams.sessionizeStream(mem.toDS(), 30,
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout))
    assert(e.getMessage.contains("EventTimeTimeout"))
  }

  test("clickPurchaseJoinStream (stream-stream interval join) matches the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val both = events ++ Seq(
      Event(6L, ts(10), 1L, "purchase", 9.0),  // joins clicks at ts(0), ts(5)
      Event(7L, ts(120), 2L, "purchase", 9.0)) // joins click at ts(65)
    val mem = MemoryStream[Event]
    mem.addData(both: _*)
    val q = EventStreams.clickPurchaseJoinStream(mem.toDF(), windowMinutes = 60)
      .writeStream.outputMode("append")
      .format("memory").queryName("join_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("join_out")
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
    val batch = EventStreams.clickPurchaseJoinBatch(both.toDF(), windowMinutes = 60)
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(batch == Set((6L, 1L), (6L, 2L), (7L, 5L)))
  }

  test("left-outer stream-stream join emits unmatched purchases after the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val both = events ++ Seq(
      Event(6L, ts(10), 1L, "purchase", 9.0),  // joins clicks at ts(0), ts(5)
      Event(8L, ts(200), 3L, "purchase", 9.0)) // user 3 has no clicks at all
    val mem = MemoryStream[Event]
    mem.addData(both: _*)
    val q = EventStreams.clickPurchaseJoinStream(mem.toDF(), windowMinutes = 60,
        watermarkDelay = "1 minutes", joinType = "left_outer")
      .writeStream.outputMode("append")
      .format("memory").queryName("outer_join_out").start()
    // outer results release only once BOTH sides' watermarks pass the join
    // window; sentinels must survive each side's event_type filter (a
    // "view" would be dropped BEFORE the watermark node and advance
    // nothing). The sentinel purchase itself stays held (above the joint
    // watermark), so it is excluded from the comparison.
    val sentinels = Seq(Event(98L, ts(10000), 9L, "click", 0.0),
      Event(99L, ts(10020), 9L, "purchase", 0.0))
    try {
      q.processAllAvailable()
      mem.addData(sentinels: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("outer_join_out")
      .filter(col("purchase_id") =!= 99L)
      .select("user_id", "purchase_id", "click_id")
      .as[(Long, Long, Option[Long])].collect().toSet
    val batch = EventStreams.clickPurchaseJoinBatch(
        (both ++ sentinels).toDF(), windowMinutes = 60, joinType = "left_outer")
      .filter(col("purchase_id") =!= 99L)
      .select("user_id", "purchase_id", "click_id")
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(streamed == batch)
    assert(batch.contains((3L, 8L, None))) // the attribution-less purchase
    assert(batch.contains((1L, 6L, Some(1L))) && batch.contains((1L, 6L, Some(2L))))
  }

  test("AvailableNow replay over the partitioned sink reproduces the batch aggregate") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_replay").toString
    // 1. land the history through the streaming sink
    val mem = MemoryStream[Event]
    mem.addData(events: _*)
    val sink = EventStreams.toPartitionedParquet(mem.toDF(), dir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try assert(sink.awaitTermination(120000)) finally sink.stop()
    // 2. replay the lake directory as a bounded stream and re-aggregate
    val replay = EventStreams.fromPartitionedParquet(spark, dir, maxFilesPerTrigger = 2)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStreams.windowedStatsStream(replay)
      .writeStream.outputMode("complete")
      .format("memory").queryName("replay_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try assert(q.awaitTermination(120000)) finally q.stop()
    val replayed = spark.table("replay_out")
      .select("h", "event_type", "cnt", "sum_value")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    val batch = EventStreams.windowedStatsBatch(events.toDF())
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(replayed == batch && batch.nonEmpty)
  }

  test("toPartitionedParquet lands micro-batches date-partitioned on disk") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val mem = MemoryStream[Event]
    mem.addData(events: _*)
    val q = EventStreams.toPartitionedParquet(mem.toDF(), dir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try assert(q.awaitTermination(120000)) finally q.stop()
    val back = spark.read.parquet(dir)
    assert(back.count() == events.length)
    assert(back.columns.contains("event_date"))
    // partition pruning: a date filter must reach the scan as a PartitionFilter
    val pruned = back.filter(col("event_date") === "2024-01-01")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_date"))
  }

  test("processLakeBatch retry rewrites its own partitions, never appends a second copy") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_retry").toString
    EventStreams.processLakeBatch(
      events.toDF().filter(col("event_id") % 2 === 0), 0L, dir)
    EventStreams.processLakeBatch(
      events.toDF().filter(col("event_id") % 2 =!= 0), 1L, dir)
    val n = spark.read.parquet(dir).count()
    assert(n == events.length)
    // a foreachBatch retry replays the same (content, batch id): dynamic
    // partition overwrite must leave the lake byte-identical in counts —
    // the r15 append sink doubled batch 0 here
    EventStreams.processLakeBatch(
      events.toDF().filter(col("event_id") % 2 === 0), 0L, dir)
    assert(spark.read.parquet(dir).count() == n)
    // and the OTHER batch's partitions survive the retry untouched
    assert(spark.read.parquet(dir)
      .filter(col("__batch_id") === 1).count() == events.count(_.event_id % 2 != 0))
  }

  test("sessionizeBatch splits on gap > 30min per user") {
    val sessions = EventStreams.sessionizeBatch(events.toDF(), 30)
      .select("user_id", "n_events").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(sessions(1L) == Seq(1L, 2L)) // [e1,e2], [e3]
    assert(sessions(2L) == Seq(1L, 1L)) // [e4], [e5]
  }

  test("sessionizeStreamEventTime closes ALL sessions once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(events: _*)
    val q = EventStreams.sessionizeStreamEventTime(mem.toDS(), gapMinutes = 30,
        watermarkDelay = "1 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_et_out").start()
    try {
      q.processAllAvailable()
      // a far-future event advances the watermark past every open
      // session's end + gap → event-time timeouts fire deterministically
      mem.addData(Event(100L, ts(10000), 9L, "view", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sess_et_out")
      .filter(col("user_id") =!= 9L)
      .select("user_id", "session_start", "session_end", "n_events")
      .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
    val batch = EventStreams.sessionizeBatch(events.toDF(), 30)
      .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
    assert(streamed == batch) // every session, not just in-batch-closed ones
    assert(batch.size == 4)
  }

  test("event-time sessionization merges late events on BOTH sides of the open session") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    // batch 1 opens a session at [120, 125] for user 7
    mem.addData(Event(10L, ts(120), 7L, "click", 0.0),
      Event(11L, ts(125), 7L, "click", 0.0))
    val q = EventStreams.sessionizeStreamEventTime(mem.toDS(), gapMinutes = 30,
        watermarkDelay = "10 hours") // wide watermark: late events admitted
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_late_out").start()
    try {
      q.processAllAvailable()
      // batch 2: one late event 20 min BEFORE the open start (within the
      // gap → start must move backward to 100), one 90 min earlier still
      // (> gap before the new start → its own, immediately-closed session)
      mem.addData(Event(12L, ts(100), 7L, "view", 0.0),
        Event(13L, ts(10), 7L, "view", 0.0))
      q.processAllAvailable()
      // a far-future event for another user pushes the watermark past
      // every open session's end + gap → event-time timeout fires
      mem.addData(Event(99L, ts(100000), 8L, "view", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sess_late_out")
      .filter(col("user_id") === 7L)
      .select("session_start", "session_end", "n_events")
      .as[(Timestamp, Timestamp, Long)].collect().toSet
    assert(got == Set((ts(10), ts(10), 1L), (ts(100), ts(125), 3L)))
  }

  test("sessionizeStream emits sessions closed by in-batch gaps") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(events: _*)
    // NoTimeout keeps the test deterministic: ProcessingTimeTimeout makes
    // the engine run unbounded empty micro-batches to evaluate timeouts.
    val q = EventStreams.sessionizeStream(mem.toDS(), 30,
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      // surfaces the query's own exception on failure instead of hanging
      assert(q.awaitTermination(120000), "streaming query did not finish in time")
    } finally q.stop()
    val closed = spark.table("sess_out")
      .select("user_id", "n_events").as[(Long, Long)].collect().toSeq
    // user 1's first session (2 events) and user 2's first (1 event) are
    // closed by newer in-batch events; still-open sessions stay in state
    // (the timeout-driven flush is exercised in production by the
    // ProcessingTimeTimeout wall clock, not reachable deterministically here)
    assert(closed.contains((1L, 2L)))
    assert(closed.contains((2L, 1L)))
  }

  test("funnel: strictly ordered progression, same-ts counts, no-first-step users absent") {
    val fe = Seq(
      // user 1: complete funnel in order → stage 3
      Event(10L, ts(0), 1L, "view", 0), Event(11L, ts(1), 1L, "click", 0),
      Event(12L, ts(2), 1L, "purchase", 0),
      // user 2: only click BEFORE the first view → click doesn't qualify, stage 1
      Event(20L, ts(2), 2L, "click", 0), Event(21L, ts(5), 2L, "view", 0),
      // user 3: click at the SAME ts as the view (>= counts) → stage 2
      Event(30L, ts(0), 3L, "view", 0), Event(31L, ts(0), 3L, "click", 0),
      // user 4: no view at all → absent from the funnel
      Event(40L, ts(0), 4L, "click", 0), Event(41L, ts(1), 4L, "purchase", 0),
      // user 5: purchase BEFORE the qualifying click → stage 2
      Event(50L, ts(0), 5L, "view", 0), Event(51L, ts(3), 5L, "click", 0),
      Event(52L, ts(1), 5L, "purchase", 0)
    ).toDF()
    val got = EventStreams.funnel(fe, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .select("user_id", "stage").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 3, 2L -> 1, 3L -> 2, 5L -> 2))
    // earliest-qualifying timestamps, not just any qualifying ones
    val row1 = EventStreams.funnel(fe, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .filter(col("user_id") === 1L)
      .select("ts_1", "ts_2", "ts_3").as[(Timestamp, Timestamp, Timestamp)]
      .collect().head
    assert(row1 == ((ts(0), ts(1), ts(2))))
  }
}
