package graft.tools

import graft.{Queries, SparkEntry}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

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
        val planStr = plan.toString
        val scans = plan.collect {
          case a: AdaptiveSparkPlanExec => a.executedPlan.collect { case s: FileSourceScanExec => s }
          case s: FileSourceScanExec => Seq(s)
        }.flatten
        val scanInfo = scans.map { s =>
          val pushed = s.metadata.getOrElse("PushedFilters", "[]")
          val cols = s.requiredSchema.fieldNames.length
          s"cols=$cols pushed=$pushed"
        }.mkString("; ")
        // cheap scale signals: shuffle count + scale-killer operators
        val exchanges = "Exchange".r.findAllIn(planStr).length
        val killers = Seq("CartesianProduct", "BroadcastNestedLoopJoin")
          .filter(planStr.contains).mkString(",")
        val flag = if (killers.nonEmpty) s" !!$killers" else ""
        println(s"[audit] $name :: shuffles=$exchanges$flag :: $scanInfo")
      } catch { case e: Throwable => println(s"[audit] $name FAILED: ${e.getMessage}") }
    }
    spark.stop()
  }
}
