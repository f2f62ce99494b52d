package graft.operators

/** md5 hex of a cache key, for deriving on-disk memo paths and table
  * names. ONE shared definition: every per-JVM memo (minhash/simhash/
  * ngram/winnow index tables, IVF/PQ artifacts, z-ordered copies,
  * bucketed tables) must key its directory on the FULL cache key — a
  * 32-bit `hashCode` name lets two distinct keys collide and silently
  * share (and overwrite) one artifact.
  */
private[graft] object KeyDigest {
  def apply(key: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
}

/** Base directory for every build-once persisted index artifact (minhash
  * signature/band tables, IVF/PQ layouts, z-ordered copies, dedup index
  * families).
  *
  * CLUSTER CONTRACT: the root must be visible to every executor —
  * `spark.read.parquet(root/…)` runs ON the executors. Set
  * `spark.graft.indexDir` to shared storage (HDFS, S3, NFS) on a real
  * cluster. The `java.io.tmpdir` fallback is node-local and therefore
  * only valid in local mode, where driver and executors share one
  * machine — on a non-local master with the conf unset these helpers
  * fail fast instead of producing unreadable-from-executors paths.
  */
private[graft] object IndexRoot {
  val ConfKey = "spark.graft.indexDir"

  def apply(spark: org.apache.spark.sql.SparkSession): String =
    spark.conf.getOption(ConfKey).map(_.stripSuffix("/")).getOrElse {
      require(spark.sparkContext.isLocal,
        s"$ConfKey is unset on a non-local master: the java.io.tmpdir " +
          "default is node-local, so executors could not read the index — " +
          "set it to a shared filesystem path (hdfs://, s3a://, NFS)")
      System.getProperty("java.io.tmpdir").stripSuffix("/") + "/graft_index"
    }

  /** Full artifact path under the root: `root/<kind>/<digest-of-key>`. */
  def path(spark: org.apache.spark.sql.SparkSession, kind: String, key: String): String =
    s"${apply(spark)}/$kind/${KeyDigest(key)}"
}
