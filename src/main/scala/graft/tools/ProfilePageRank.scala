package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level timing + variant comparison of the q_pagerank battery
  * pipeline at sf0.1. Run:
  *   sbt 'runMain graft.tools.ProfilePageRank [sfDir]'
  */
object ProfilePageRank {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    def pairsDf(): DataFrame =
      spark.read.parquet(s"$dir/lineitem.parquet")
        .select("l_orderkey", "l_suppkey")
        .join(spark.read.parquet(s"$dir/orders.parquet")
          .select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))

    def run(label: String, distinctFirst: Boolean, bcast: Boolean): Unit = {
      val pairs = pairsDf()
      val edges0 =
        if (distinctFirst) {
          // src/dst namespaces are disjoint (c* vs s*), so the reversed
          // set of a distinct pair set is distinct and disjoint from it
          val d = pairs.distinct()
          d.union(d.select(col("dst").as("src"), col("src").as("dst")))
        } else
          pairs.union(pairs.select(col("dst").as("src"), col("src").as("dst")))
            .distinct()
      val e = edges0.filter(col("src").isNotNull && col("dst").isNotNull)
        .persist()
      val ecnt = t(s"$label edges build+persist")(e.count())
      val outd = e.groupBy("src").agg(count(lit(1)).as("__od")).persist()
      outd.count()
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst"))).distinct().persist()
      val n = t(s"$label outd+nodes")(nodes.count())

      val q = 1L << 40
      val rank0 = q / n
      val teleport = ((q * 15) / 100) / n
      var rank = nodes.select(col("node"), lit(rank0).as("rank_q"))
      var persisted = List.empty[DataFrame]
      for (_ <- 1 to 3) {
        val rsrc = rank.withColumnRenamed("node", "src")
        val contribs = e
          .join(if (bcast) broadcast(rsrc) else rsrc, "src")
          .join(if (bcast) broadcast(outd) else outd, "src")
          .select(col("dst"), expr("(rank_q * 85) div (100 * __od)").as("__contrib"))
          .groupBy("dst").agg(sum(col("__contrib")).as("__in"))
        val next = nodes
          .join(contribs, col("node") === col("dst"), "left")
          .select(col("node"),
            (lit(teleport) + coalesce(col("__in"), lit(0L))).as("rank_q"))
          .persist()
        persisted ::= next
        rank = next
      }
      val chk = t(s"$label 3 rounds")(
        rank.agg(sum("rank_q")).head().getLong(0))
      println(s"[prof] $label edges=$ecnt nodes=$n ranksum=$chk")
      persisted.foreach(_.unpersist())
      e.unpersist(); outd.unpersist(); nodes.unpersist()
      spark.catalog.clearCache()
    }

    // integer-id variant: hash node strings to 64-bit ids once, run all
    // rounds on (long,long) edges, map back at the end
    def runInt(label: String): Unit = {
      val pairs = pairsDf()
      val edges0 = pairs.union(
          pairs.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
      val e = edges0
        .filter(col("src").isNotNull && col("dst").isNotNull)
        .select(xxhash64(col("src")).as("src"), xxhash64(col("dst")).as("dst"))
        .persist()
      val outd = e.groupBy("src").agg(count(lit(1)).as("__od")).persist()
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst"))).distinct().persist()
      val n = t(s"$label nodes count")(nodes.count())
      val q = 1L << 40
      val rank0 = q / n
      val teleport = ((q * 15) / 100) / n
      var rank = nodes.select(col("node"), lit(rank0).as("rank_q"))
      var persisted = List.empty[DataFrame]
      for (_ <- 1 to 3) {
        val contribs = e
          .join(rank.withColumnRenamed("node", "src"), "src")
          .join(outd, "src")
          .select(col("dst"), expr("(rank_q * 85) div (100 * __od)").as("__contrib"))
          .groupBy("dst").agg(sum(col("__contrib")).as("__in"))
        val next = nodes
          .join(contribs, col("node") === col("dst"), "left")
          .select(col("node"),
            (lit(teleport) + coalesce(col("__in"), lit(0L))).as("rank_q"))
          .persist()
        persisted ::= next
        rank = next
      }
      val chk = t(s"$label 3 rounds")(rank.agg(sum("rank_q")).head().getLong(0))
      println(s"[prof] $label nodes=$n ranksum=$chk")
      persisted.foreach(_.unpersist())
      e.unpersist(); outd.unpersist(); nodes.unpersist()
      spark.catalog.clearCache()
    }

    def withAqeOff[A](f: => A): A = {
      val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try f finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    }

    // warm-up then measured passes of each variant
    run("warm", distinctFirst = false, bcast = false)
    for (p <- 1 to 2) {
      run(s"base#$p", distinctFirst = false, bcast = false)
      runInt(s"int#$p")
      withAqeOff(run(s"noaqe#$p", distinctFirst = false, bcast = true))
      withAqeOff(runInt(s"noaqe_int#$p"))
    }
    spark.stop()
  }
}
