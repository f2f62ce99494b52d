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

    // ---- embedding twin: `clique` items share ONE exact vector (the
    // identically-embedded boilerplate hazard), the rest hash-spread ----
    val dim = 16
    val vec = array((0 until dim).map { d =>
      // cast the DIVISION back to float: SQL division promotes to double,
      // and CosineSimilarity (rightly) refuses array<double>
      when(col("id") < clique, lit((d + 1).toFloat))
        .otherwise(((pmod(xxhash64(col("id"), lit(d)), lit(1000)).cast("double")
          - lit(500.0)) / lit(500.0)).cast("float"))
    }: _*)
    val etbl = spark.range(n).select(col("id"), vec.as("embedding")).persist()
    etbl.count()
    // density-scaled tuning (the production default): buckets hold
    // ~bounded occupancy on the SPREAD vectors, so the guarded run
    // isolates the clique effect (post-collapse the clique is ONE rep and
    // no bucket is oversized — pure certificate, no cap loss here; the
    // cap trade is spec-pinned separately)
    val t = graft.operators.LshTuning.forCorpus(n.toLong, 0.95)
    println(s"embed tuning: planes=${t.planes} tables=${t.tables}")
    for ((label, mb) <- Seq("embed unguarded(maxBucket=0)" -> 0,
                            "embed guarded(maxBucket=1000)" -> 1000)) {
      val t0 = System.nanoTime()
      val c = graft.operators.Dedup.embeddingPairsLsh(etbl, "id", "embedding",
        threshold = 0.95, planes = t.planes, tables = t.tables,
        maxBucket = mb).count()
      println(f"$label: $c%d pairs in ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"(n=$n%d, clique=$clique%d)")
    }
    // incremental form: the whole clique arrives as ONE BATCH against an
    // index that already holds clique/5 copies of the clique vector —
    // uncollapsed candidates are batch×indexed-copies (quadratic in
    // density), collapse probes once and expands to the (output-sized)
    // pair set afterwards
    val batch = etbl.filter(col("id") < clique)
    val idx = graft.operators.Dedup.embeddingLshIndex(
      etbl.filter(col("id") >= clique).unionByName(
        spark.range(math.max(clique / 5, 1)).select((col("id") + n).as("id"),
          array((0 until dim).map(d => lit((d + 1).toFloat)): _*).as("embedding"))),
      "id", "embedding", planes = 3, tables = 8)
      .persist()
    idx.count()
    for (cb <- Seq(false, true)) {
      val t0 = System.nanoTime()
      val c = graft.operators.Dedup.incrementalEmbeddingPairsLsh(batch, "id",
        "embedding", idx, threshold = 0.95, planes = 3, tables = 8,
        collapseBatch = cb).count()
      println(f"embed incremental collapseBatch=$cb: $c%d pairs in " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
