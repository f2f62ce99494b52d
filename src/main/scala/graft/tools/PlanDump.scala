package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump scan/join/aggregate counts of a battery row's physical plan — the
  * cheap first look when a sweep flags a row (is the source scanned N
  * times? did a join fall to nested-loop?). Usage: PlanDump <name> [dir].
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    Seq("documents.parquet", "SortMergeJoin", "BroadcastHashJoin",
        "BroadcastNestedLoop", "HashAggregate", "ObjectHashAggregate",
        "Generate", "Exchange", "Subquery").foreach { p =>
      println(s"$p=" + p.r.findAllIn(plan).length)
    }
    if (sys.env.contains("PLAN_FULL")) println(plan)
    spark.stop()
  }
}
