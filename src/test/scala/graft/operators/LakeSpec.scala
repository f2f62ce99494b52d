package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

class LakeSpec extends SparkSpec {
  import spark.implicits._

  private def parquetFilesPerDir(root: String): Map[String, Int] = {
    val dirs = Files.list(Paths.get(root)).iterator()
    var m = Map.empty[String, Int]
    dirs.forEachRemaining { d =>
      if (Files.isDirectory(d) && d.getFileName.toString.contains("=")) {
        val n = Files.list(d).iterator()
        var c = 0
        n.forEachRemaining(f => if (f.toString.endsWith(".parquet")) c += 1)
        m += d.getFileName.toString -> c
      }
    }
    m
  }

  test("writePartitioned emits one file per partition dir (vs task-explosion default)") {
    val df = (1 to 4000).map(i => (i.toLong, s"2024-01-${i % 5 + 10}")).toDF("id", "dt")
      .repartition(16) // simulate many upstream tasks
    val controlled = Files.createTempDirectory("lake_ctl").toString
    val naive = Files.createTempDirectory("lake_naive").toString
    Lake.writePartitioned(df, controlled, Seq("dt"))
    df.write.mode("overwrite").partitionBy("dt").parquet(naive)
    val ctl = parquetFilesPerDir(controlled)
    val nv = parquetFilesPerDir(naive)
    assert(ctl.size == 5 && ctl.values.forall(_ == 1), ctl.toString)
    assert(nv.values.sum > ctl.values.sum, s"naive=$nv controlled=$ctl")
    // content survives the rerouting
    assert(spark.read.parquet(controlled).count() == 4000)
  }

  test("writeOrderedShards: contiguous global ranges, sorted within each shard") {
    val df = (0L until 5000L).map(i => (i, (i * 2654435761L) % 100000L))
      .toDF("id", "ord").repartition(11)
    val out = Files.createTempDirectory("lake_shards").toString
    val manifest = Lake.writeOrderedShards(df, out, Seq(col("ord"), col("id")), 8)
      .as[(Long, Long)].collect().toSeq
    assert(manifest.map(_._2).sum == 5000L)
    assert(manifest.size == 8 && manifest.map(_._1) == manifest.map(_._1).sorted)
    val back = spark.read.parquet(out)
    // cross-shard: shard i's max key < shard i+1's min key
    val ranges = back.groupBy("shard")
      .agg(min(col("ord")).as("lo"), max(col("ord")).as("hi"))
      .orderBy("shard").as[(Long, Long, Long)].collect()
    ranges.sliding(2).foreach { case Array(a, b) => assert(a._3 <= b._2) case _ => }
    // within-shard: file row order is the sort order
    val shard0 = spark.read.parquet(s"$out/shard=0").select("ord").as[Long].collect().toSeq
    assert(shard0 == shard0.sorted)
    assert(back.count() == 5000)
  }

  test("filesPerPartition salt spreads a hot partition across bounded files") {
    val df = (1 to 3000).map(i => (i.toLong, "2024-01-10")).toDF("id", "dt")
      .repartition(16) // one hot partition value
    val out = Files.createTempDirectory("lake_hot").toString
    Lake.writePartitioned(df, out, Seq("dt"), filesPerPartition = 3)
    val files = parquetFilesPerDir(out)
    // hash-distributed: at most filesPerPartition, more than the single
    // file the unsalted path would produce
    assert(files("dt=2024-01-10") >= 2 && files("dt=2024-01-10") <= 3, files.toString)
    assert(spark.read.parquet(out).select(sum("id")).as[Long].head() ==
      (1 to 3000).map(_.toLong).sum)
  }
}
