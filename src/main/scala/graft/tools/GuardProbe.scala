package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Degenerate-chunk probe for the pigeonhole Hamming joins: a corpus in
  * which a large fraction of items carry ONE perceptual hash (the
  * smooth-image / silent-clip hazard) times pair generation with the
  * guard off (`maxBucket = 0`, exact all-pairs — quadratic inside the
  * clique's chunk groups) and on (stars + distinct-hash join). The
  * numbers land in SCALE.md.
  *
  * args: [nItems] [cliqueSize] — defaults 50000 / 5000.
  */
object GuardProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(50000)
    val clique = args.lift(1).map(_.toInt).getOrElse(5000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // `clique` items share one hash (a flat-region dHash); the rest are
    // xxhash-spread, so near-pairs outside the clique are rare — the
    // join cost is dominated by the degenerate groups, as in the hazard
    val tbl = spark.range(n).select(col("id"),
        when(col("id") < clique, lit(0x0F0F0F0F0F0F0F0FL))
          .otherwise(xxhash64(col("id"))).as("sh"))
      .persist()
    tbl.count()
    for ((label, mb) <- Seq("unguarded(maxBucket=0)" -> 0, "guarded(maxBucket=1000)" -> 1000)) {
      val t0 = System.nanoTime()
      val c = graft.operators.Dedup.simhashPairsFromTable(tbl, 3, mb).count()
      println(f"$label: $c%d pairs in ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"(n=$n%d, clique=$clique%d)")
    }
    spark.stop()
  }
}
