package graft

import graft.functions.TextFunctions._
import graft.operators.{Dedup, Multimodal, Similarity}
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._

/** One family section of the LLM-data-pipeline extension
  * battery (split out of ExtQueries.scala at round 19 — no
  * behavior change; see [[ExtQueries.all]] for the union).
  */
private[graft] object ZorderBattery {
  import Queries.{Q, table, events}
  import BatteryUtil._


  val queries: Seq[(String, Q)] = Seq(
    // Z-ORDERED layout scan: the events table laid out on the Morton
    // interleave of (user_id, cents) — written once per JVM (the nightly
    // layout job), then a two-dimensional range predicate + aggregate
    // over the z-ordered files must equal the same query on the raw
    // table. The layout's PRUNING property (every z dimension's min/max
    // footer span narrow in every file) is spec-pinned in LakeSpec; this
    // row makes the layout's correctness driver-visible.
    "q_zorder_scan" -> Q(
      (s, dir) => {
        val ev = events(s, dir)
          .withColumn("cents", round(col("value") * 100).cast("long"))
          .select("event_id", "user_id", "cents")
        graft.operators.Lake.ensureZOrdered(ev, s"$dir/events!zorder",
            Seq("user_id", "cents"))
          .filter(col("user_id").between(40, 90) &&
            col("cents").between(10000L, 30000L))
          .groupBy("user_id")
          .agg(count(lit(1)).as("cnt"), sum(col("cents")).as("sum_cents"))
      },
      Some("""
        SELECT user_id, count(*) AS cnt,
          CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        FROM events
        WHERE user_id BETWEEN 40 AND 90
          AND CAST(round(value * 100) AS BIGINT) BETWEEN 10000 AND 30000
        GROUP BY 1""")),
  )
}
