package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures what the partitioned copy-on-write merge is FOR: a
  * partition-LOCAL update batch against a large snapshot. Bootstraps a
  * snapshot from the sf1 orders table (flat and partitioned layouts),
  * then merges a small contiguous-key batch and times both paths — flat
  * pays an O(table) rewrite, partitioned pays O(touched partitions).
  *
  * Run: sbt 'runMain graft.tools.ProfileCdc [sf1Dir]'
  */
object ProfileCdc {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.streaming.ChangeStreams

    val root = java.nio.file.Files.createTempDirectory("graft_cdcprof").toString
    val base = spark.read.parquet(s"$dir/orders.parquet").select(
        col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .withColumn("v", lit(1L)).withColumn("del", lit(false))
    val nRows = base.count()
    // contiguous key range → ONE partition under the range expr below
    val localBatch = base.filter(col("o_orderkey") < 50000)
      .withColumn("cents", col("cents") + 100L).withColumn("v", lit(2L))
    val nBatch = localBatch.count()
    val part = Some(("okrange", floor(col("o_orderkey") / lit(1000000L))))

    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[cdc] $label%-42s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }

    t(s"flat bootstrap ($nRows rows)") {
      ChangeStreams.mergeBatch(base, Seq("o_orderkey"), Seq("v"),
        col("del"), s"$root/flat")
    }
    t(s"part bootstrap ($nRows rows)") {
      ChangeStreams.mergeBatch(base, Seq("o_orderkey"), Seq("v"),
        col("del"), s"$root/part", snapshotPartition = part)
    }
    for (i <- 1 to 2) {
      t(s"flat local-batch merge #$i ($nBatch rows)") {
        ChangeStreams.mergeBatch(localBatch, Seq("o_orderkey"), Seq("v"),
          col("del"), s"$root/flat")
      }
      t(s"part local-batch merge #$i ($nBatch rows)") {
        ChangeStreams.mergeBatch(localBatch, Seq("o_orderkey"), Seq("v"),
          col("del"), s"$root/part", snapshotPartition = part)
      }
    }
    // bytes REWRITTEN by a local-batch merge: the flat path rewrites the
    // whole snapshot; the partitioned path rewrites one partition dir
    def du(p: String): Long = {
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(path)) fs.getContentSummary(path).getLength else 0L
    }
    println(f"[cdc] flat rewrite footprint      ${du(s"$root/flat") / 1e6}%8.1f MB")
    println(f"[cdc] part rewrite footprint      ${du(s"$root/part/okrange=0") / 1e6}%8.1f MB" +
      f" (of ${du(s"$root/part") / 1e6}%.1f MB total)")

    // sanity: both layouts converged to the same live state
    val flatLive = ChangeStreams.readSnapshot(spark, s"$root/flat")
      .agg(sum("cents"), count(lit(1))).head()
    val partLive = ChangeStreams.readSnapshot(spark, s"$root/part", Some("okrange"))
      .agg(sum("cents"), count(lit(1))).head()
    println(s"[cdc] flat=$flatLive part=$partLive identical=${flatLive == partLive}")
    spark.stop()
  }
}
