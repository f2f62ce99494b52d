package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch lake-layout writer with SMALL-FILES CONTROL.
  *
  * A naive `df.write.partitionBy(cols)` emits one file per (task ×
  * partition value) — at 1000 tasks × 365 dates that is 365,000 files per
  * day of output, and the metadata/listing cost of millions of tiny files
  * is a top-three operational failure mode of large lakes. Repartitioning
  * by the partition columns FIRST routes each partition value to exactly
  * one task (one file per directory); a row-hash salt spreads hot
  * partitions across `filesPerPartition` tasks when one file would be too
  * large or too slow to write.
  */
object Lake {

  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       filesPerPartition: Int = 1,
                       mode: String = "overwrite"): Unit = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    require(filesPerPartition >= 1, "filesPerPartition must be >= 1")
    val keys = partitionCols.map(col)
    val routed =
      if (filesPerPartition == 1) df.repartition(keys: _*)
      else {
        // explicit partition count: an un-pinned repartition(cols) lets AQE
        // coalesce the small salted partitions back into one task, undoing
        // the hot-partition split. Result: AT MOST filesPerPartition files
        // per directory (hash-distributed, so fewer when salts collide).
        val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
          .max(filesPerPartition)
        df.repartition(n, keys :+
          pmod(xxhash64(struct(df.columns.map(col): _*)), lit(filesPerPartition)): _*)
      }
    routed.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)
  }

  /** GLOBALLY-ORDERED SHARD EXPORT — the final "emit training shards"
    * step: rows ordered by `orderBy` are written as `numShards` parquet
    * shards such that shard i holds a contiguous range of the global
    * order and every shard is sorted internally (a trainer streaming
    * shard 0, 1, 2… reads the corpus in exact curriculum/pack order).
    *
    * `repartitionByRange` samples the order keys to compute balanced
    * range boundaries (one pass), then each task sorts only its own
    * shard — the full corpus is never sorted in one task, unlike
    * `orderBy(...).coalesce(n)`. Returns the shard → row-count manifest,
    * computed from the written files.
    */
  def writeOrderedShards(df: DataFrame, path: String,
                         orderBy: Seq[org.apache.spark.sql.Column],
                         numShards: Int,
                         mode: String = "overwrite"): DataFrame = {
    require(numShards >= 1, "numShards must be >= 1")
    df.repartitionByRange(numShards, orderBy: _*)
      .sortWithinPartitions(orderBy: _*)
      .withColumn("shard", spark_partition_id().cast("long"))
      .write.mode(mode).partitionBy("shard").parquet(path)
    df.sparkSession.read.parquet(path)
      .groupBy("shard").agg(count(lit(1)).as("n_rows"))
      .orderBy("shard")
  }
}
