package graft.tools

import graft.{Queries, SparkEntry}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ReusedExchangeExec, ShuffleExchangeLike}

/** Dev tool: for every battery query, report whether parquet scans carry
  * pushed filters and how wide the read schema is — the two cheapest
  * plan-quality signals. Also smoke-runs SparkEntry.entry.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val n = SparkEntry.entry(spark).count()
    println(s"[audit] entry rows=$n")

    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.executedPlan
        // walk the tree (AQE's inner plan is not a child — descend
        // explicitly) so shuffle counting sees typed nodes, not the plan
        // string: "Exchange".r over toString also matched
        // BroadcastExchange and double-counted ReusedExchange
        def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
          case a: AdaptiveSparkPlanExec => a +: nodes(a.executedPlan)
          case r: ReusedExchangeExec => Seq(r) // reuse is free — don't descend
          case _ => p +: p.children.flatMap(nodes)
        }
        val all = nodes(plan)
        val scans = all.collect { case s: FileSourceScanExec => s }
        val scanInfo = scans.map { s =>
          val pushed = s.metadata.getOrElse("PushedFilters", "[]")
          val cols = s.requiredSchema.fieldNames.length
          s"cols=$cols pushed=$pushed"
        }.mkString("; ")
        // cheap scale signals: true shuffle count (broadcasts reported
        // separately — they're a different, usually desirable, cost) +
        // scale-killer operators
        val shuffles = all.count(_.isInstanceOf[ShuffleExchangeLike])
        val bcasts = all.count(_.isInstanceOf[BroadcastExchangeLike])
        val killers = all.map(_.nodeName)
          .filter(n => n.contains("CartesianProduct") || n.contains("BroadcastNestedLoopJoin"))
          .distinct.mkString(",")
        val flag = if (killers.nonEmpty) s" !!$killers" else ""
        println(s"[audit] $name :: shuffles=$shuffles bcasts=$bcasts$flag :: $scanInfo")
      } catch { case e: Throwable => println(s"[audit] $name FAILED: ${e.getMessage}") }
    }
    spark.stop()
  }
}
