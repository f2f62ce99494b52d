package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** VOTE-recall sweep for the label-propagation rungs (round-16): neighbor
  * recall (ANN_SWEEP.md) understates a voting operator's robustness — a
  * missed neighbor only matters when it FLIPS the majority. This tool
  * measures, per (planes, tables) tuning, the fraction of queries whose
  * [[graft.operators.Similarity.labelPropagateLsh]] prediction equals the
  * exact [[graft.operators.Similarity.labelPropagate]] prediction on the
  * same split (every 10th vector queries the labeled rest, k = 5 — the
  * q_knn_label convention), plus how many queries the bucket join loses
  * entirely (zero candidates → no row).
  *
  * Run: java -cp … graft.tools.LabelVoteSweep [sfDir]
  */
object LabelVoteSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 10 === 0)
    val seeds = emb.filter(col("vec_id") % 10 =!= 0)
    val brute = graft.operators.Similarity
      .labelPropagate(queries, seeds, "vec_id", "embedding", "label", k = 5)
      .as[(Long, Int, Long)].collect().map(r => r._1 -> r._2).toMap
    println(s"corpus=$sfDir queries=${brute.size} seeds=${seeds.count()} k=5")
    println("| planes | tables | vote agreement | queries lost |")
    println("|---|---|---|---|")
    for ((p, t) <- Seq((2, 4), (3, 8), (4, 8), (4, 16), (6, 16))) {
      val lsh = graft.operators.Similarity
        .labelPropagateLsh(queries, seeds, "vec_id", "embedding", "label",
          k = 5, planes = p, tables = t, seed = 42L)
        .as[(Long, Int, Long)].collect().map(r => r._1 -> r._2).toMap
      val agree = brute.count { case (q, l) => lsh.get(q).contains(l) }
      val lost = brute.size - lsh.size
      println(f"| $p | $t | $agree/${brute.size} (${100.0 * agree / brute.size}%.1f%%) | $lost |")
    }
    spark.stop()
  }
}
