package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for SHUFFLE-FREE co-located joins and
  * aggregations — the storage-level answer to "this join shuffles 100 TB
  * every night".
  *
  * Writing both sides of a recurring join bucketed by the join key (same
  * bucket count) lets Spark plan a SortMergeJoin with NO Exchange on
  * either side: each task reads matching bucket files directly. Same for
  * `groupBy(key)` on one bucketed table — partial aggregation feeds a
  * final aggregate without a hash exchange. The write itself shuffles
  * once; every subsequent query amortizes it.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. `sortBy` the same
    * keys so merge joins skip their per-task sort too.
    */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    numBuckets: Int, overwrite: Boolean = true): Unit = {
    require(keys.nonEmpty && numBuckets > 0, "keys and numBuckets required")
    val w = df.write
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
    (if (overwrite) w.mode("overwrite") else w).saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata rides in the catalog, so
    * a plain table read carries the output partitioning into planning).
    */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Write-once access to a bucketed layout: builds and writes the table
    * only if the catalog doesn't already have it, then reads it back — the
    * amortization contract of bucketing (one shuffle at write time, zero
    * on every subsequent join/aggregate).
    */
  def ensureBucketed(spark: SparkSession, table: String, keys: Seq[String],
                     numBuckets: Int)(build: => DataFrame): DataFrame = {
    if (!spark.catalog.tableExists(table)) {
      // a previous JVM's leftover warehouse directory fails CREATE with
      // LOCATION_ALREADY_EXISTS (overwrite only applies to catalog-known
      // tables) — clear the stale location first
      val wh = java.net.URI.create(spark.conf.get("spark.sql.warehouse.dir"))
      val loc = new java.io.File(
        if (wh.getPath != null && wh.getPath.nonEmpty) wh.getPath
        else wh.toString, table.toLowerCase)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      if (loc.exists()) rm(loc)
      writeBucketed(build, table, keys, numBuckets)
    }
    spark.table(table)
  }
}
