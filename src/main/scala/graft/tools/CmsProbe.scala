package graft.tools

import graft.operators.Profile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage decomposition of the q_cms battery row at a given SF dir
  * — the sf10 sweep measured 3.0 s (sf1) → 244 s (sf10), 80× for 10× data,
  * and the native md5 swap didn't move it: something OTHER than the hash
  * is superlinear. Times, separately: the parquet scan, the token explode,
  * the hash+explode WITHOUT aggregation, the full sketch build, and the
  * estimate tail, so the superlinear stage is measured rather than argued.
  */
object CmsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def time(name: String)(f: => Unit): Unit = {
      spark.catalog.clearCache()
      System.gc()
      val g0 = gcMs
      val t0 = System.nanoTime()
      f
      println(f"| $name | ${(System.nanoTime() - t0) / 1e9}%.2f s | gc ${gcMs - g0} ms |")
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def toks = docs.withColumn("slice", col("doc_id") % 4)
      .select(col("lang"), col("slice"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))

    // warm
    toks.limit(1000).write.mode("overwrite").format("noop").save()

    time("scan only")(docs.select("lang").write.mode("overwrite")
      .format("noop").save())
    time("token explode")(toks.write.mode("overwrite").format("noop").save())
    time("token count")(println("  n_tokens=" + toks.count()))
    time("hash+explode no agg") {
      val rows = (0 until 3).map { r =>
        struct(lit(r).as("r"),
          graft.functions.Md5Bucket.column(
            concat(col("token"), lit(":"), lit(r.toString)), 64L).as("b"))
      }
      toks.filter(col("token").isNotNull)
        .select(col("lang"), col("slice"),
          explode(array(rows: _*)).as("__rb"))
        .write.mode("overwrite").format("noop").save()
    }
    time("full cmsSketch build") {
      Profile.cmsSketch(toks, col("token"), 3, 64, Seq("lang", "slice"))
        .write.mode("overwrite").format("noop").save()
    }
    (1 to 3).foreach { i =>
      time(s"build + merge #$i") {
        Profile.cmsMerge(
            Profile.cmsSketch(toks, col("token"), 3, 64, Seq("lang", "slice")),
            Seq("lang"))
          .write.mode("overwrite").format("noop").save()
      }
    }
    time("estimate on PERSISTED merged sketch") {
      val merged = Profile.cmsMerge(
        Profile.cmsSketch(toks, col("token"), 3, 64, Seq("lang", "slice")),
        Seq("lang")).persist()
      merged.count()
      Profile.cmsEstimate(merged,
          Seq("vector", "spark", "customer", "zzz_not_a_token"), 3, 64,
          Seq("lang"))
        .write.mode("overwrite").format("noop").save()
      merged.unpersist()
    }
    (1 to 3).foreach { i =>
      time(s"full q_cms row #$i") {
        graft.SparkEntry.queries("q_cms")(spark, dir)
          .write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
