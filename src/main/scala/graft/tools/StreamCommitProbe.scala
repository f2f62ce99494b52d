package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-20 commit-share probe for the Structured-Streaming battery rows
  * (VERDICT r19 #4's stated precondition): drives the q_session_stream
  * protocol (MemoryStream sessionizer, 3 even slices + sentinel) under a
  * StreamingQueryListener and prints each micro-batch's duration
  * breakdown (`durationMs`: addBatch / getBatch / latestOffset /
  * queryPlanning / walCommit / commitOffsets) plus the state-store
  * commit/rows metrics — so "state-store commit cadence dominates" is a
  * measured claim before any provider/maintenance tuning is attempted.
  *
  * args: [sfDir=/root/testdata/sf0.1]
  */
object StreamCommitProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val progresses = scala.collection.mutable.ArrayBuffer[
      org.apache.spark.sql.streaming.StreamingQueryProgress]()
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
          progresses.synchronized { progresses += e.progress; () }
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      })

    val pinned = graft.Queries.events(spark, dir)
      .filter(col("event_id") < 5000)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[graft.streaming.Event].collect()
      .sortBy(e => (e.ts.getTime, e.event_id))

    (0 until 2).foreach { pass =>
      progresses.synchronized(progresses.clear())
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[graft.streaming.Event]
      val w0 = System.nanoTime()
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      val q = graft.streaming.EventStreams
        .sessionizeStreamEventTime(mem.toDS(), gapMinutes = 30,
          watermarkDelay = "1 minutes")
        .writeStream.outputMode("append").format("memory")
        .queryName(s"commit_probe_$pass").start()
      try {
        val slices = pinned.grouped((pinned.length + 2) / 3).toSeq
        slices.foreach { b => mem.addData(b.toSeq: _*); q.processAllAvailable() }
        val far = pinned.map(_.ts.getTime).max + 90L * 24 * 3600 * 1000
        mem.addData(graft.streaming.Event(
          -1L, new java.sql.Timestamp(far), -1L, "view", 0.0))
        q.processAllAvailable()
      } finally { q.stop(); spark.conf.set("spark.sql.shuffle.partitions", prev) }
      val wall = (System.nanoTime() - w0) / 1e9
      Thread.sleep(300)
      println(f"== pass $pass: wall=$wall%.2f s ==")
      import scala.jdk.CollectionConverters._
      progresses.synchronized(progresses.toSeq).foreach { p =>
        val d = p.durationMs.asScala
        val st = p.stateOperators.headOption
        println(s"batch ${p.batchId}: total=${d.getOrElse("triggerExecution", -1L)}ms " +
          s"addBatch=${d.getOrElse("addBatch", -1L)} " +
          s"plan=${d.getOrElse("queryPlanning", -1L)} " +
          s"wal=${d.getOrElse("walCommit", -1L)} " +
          s"commitOff=${d.getOrElse("commitOffsets", -1L)} " +
          st.map(s => s"stateCommit=${s.customMetrics.asScala.getOrElse("stateOnCurrentVersionSizeBytes", -1L)}B " +
            s"commitMs=${s.commitTimeMs}ms rowsUpd=${s.numRowsUpdated}").getOrElse(""))
      }
    }
    spark.stop()
  }
}
