package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-20 file-count probe for the streaming lake sink
  * (q_lake_sink_replay / [[graft.streaming.EventStreams.processLakeBatch]]):
  * runs the row's 3-batch + retry protocol and reports, per batch, the
  * wall seconds and the parquet file / partition-dir counts the sink
  * left behind — the §6 small-files evidence a REBALANCE-by-date change
  * is graded against (VERDICT r19 #5's stated precondition).
  *
  * args: [sfDir=/root/testdata/sf0.1]
  */
object LakeSinkProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ev = graft.Queries.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    (0 until 2).foreach { pass =>
      val lakePath = graft.Queries.tempDir("graft_lakeprobe") + "/lake"
      println(s"== pass $pass (pass 0 warms) ==")
      def stats(): (Long, Long) = {
        var files = 0L; var dirs = 0L
        def walk(f: java.io.File): Unit = {
          val kids = Option(f.listFiles()).getOrElse(Array.empty)
          kids.foreach { k =>
            if (k.isDirectory) { dirs += 1; walk(k) }
            else if (k.getName.endsWith(".parquet")) files += 1
          }
        }
        walk(new java.io.File(lakePath))
        (files, dirs)
      }
      (0 until 3).foreach { i =>
        val w0 = System.nanoTime()
        graft.streaming.EventStreams.processLakeBatch(
          ev.filter(col("event_id") % 3 === i), i.toLong, lakePath)
        val (f, d) = stats()
        println(f"batch $i%d: wall=${(System.nanoTime() - w0) / 1e9}%.2f s " +
          f"files=$f%d dirs=$d%d")
      }
      val w0 = System.nanoTime()
      graft.streaming.EventStreams.processLakeBatch(
        ev.filter(col("event_id") % 3 === 1), 1L, lakePath)
      val (f, d) = stats()
      println(f"retry : wall=${(System.nanoTime() - w0) / 1e9}%.2f s " +
        f"files=$f%d dirs=$d%d")
      val w1 = System.nanoTime()
      spark.read.parquet(lakePath).write.format("noop")
        .mode("overwrite").save()
      println(f"read-back: ${(System.nanoTime() - w1) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
