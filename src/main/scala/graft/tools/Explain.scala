package graft.tools

import graft.Queries
import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan (and optionally time) of one
  * battery query. Usage: runMain graft.tools.Explain <queryName> [sfDir] [time]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = Queries.all.collectFirst { case (`name`, q) => q.run(spark, sfDir) }.get
    df.explain("formatted")
    if (args.contains("time")) {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"ELAPSED ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
