package graft.tools

import org.apache.spark.sql.SparkSession

/** FULL-battery 10× sweep (SCALE.md's completeness pass): every
  * `SparkEntry.queries` entry timed at sf0.1 and at the derived sf1
  * corpus, one warmed run each, with the time ratio flagged when it
  * exceeds 3× — the "constant factors hiding superlinear behavior"
  * check. ScaleTen measures the 15 most expensive pipelines with
  * 3-run medians; this tool trades per-query precision for coverage
  * of all ~151 rows, so a query whose cost curve bends only shows up
  * here.
  *
  * Run: SPARK_DRIVER_MEM=48g sbt 'runMain graft.tools.ScaleFull [sf01] [sf1Out]'
  *
  * Env knobs (both optional):
  *  - SPARK_GRAFT_SWEEP_ONLY=a,b,c  — sweep only the named rows (same
  *    spelling as SPARK_GRAFT_BENCH_ONLY on Bench).
  *  - SPARK_GRAFT_SWEEP_WARM_PER_SF=1 — before timing a query at an SF,
  *    run it once untimed AT THAT SF (Bench's own discipline). The
  *    default (sf0.01-only warm) deliberately keeps one-time index
  *    builds (k-means fits, BM25 postings) inside the timed run — a
  *    completeness check that nothing cold is pathological; the per-SF
  *    warm isolates the steady-state probe cost the way production
  *    (offline index job + online probes) actually runs.
  */
object ScaleFull {
  def main(args: Array[String]): Unit = {
    val sf01 = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    ScaleTen.derive(spark, sf01, out)

    // Same measurement discipline as Bench: noop sink (count() lets
    // Catalyst eliminate non-cardinality work), cache cleared between
    // runs so memoized indices don't turn the timed run into a cache
    // read, GC + settle so a heavy predecessor's churn doesn't bill
    // the next query.
    def time(name: String, dir: String): Double = {
      spark.catalog.clearCache()
      System.gc()
      Thread.sleep(100)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    val only = sys.env.get("SPARK_GRAFT_SWEEP_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val warmPerSf = sys.env.get("SPARK_GRAFT_SWEEP_WARM_PER_SF").contains("1")
    def warm(n: String, dir: String): Unit =
      try time(n, dir)
      catch { case e: Throwable => println(s"WARM FAIL $n@$dir: ${e.getMessage}") }

    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // one pass at sf0.01 warms codegen/JIT/classloading for every query
    names.foreach(warm(_, "/root/testdata/sf0.01"))

    val sb = new StringBuilder
    sb.append("| query | sf0.1 | sf1 (10x) | ratio |\n|---|---|---|---|\n")
    var failed = List.empty[String]
    names.foreach { n =>
      try {
        if (warmPerSf) warm(n, sf01)
        val t01 = time(n, sf01)
        if (warmPerSf) warm(n, out)
        val t1 = time(n, out)
        val flag = if (t1 / t01 > 3.0) " ⚠" else ""
        sb.append(f"| $n | $t01%.2f | $t1%.2f | ${t1 / t01}%.1f×$flag |\n")
        println(f"$n%-28s $t01%7.2f $t1%7.2f ${t1 / t01}%5.1fx$flag")
      } catch {
        case e: Throwable =>
          failed ::= n
          println(s"FAIL $n: ${e.getClass.getSimpleName} ${e.getMessage}")
      }
    }
    if (failed.nonEmpty) sb.append(s"\nFAILED at sf1: ${failed.mkString(", ")}\n")
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/tmp/graft_scale_full.md"),
      sb.toString.getBytes("UTF-8"))
    println("\nwrote /tmp/graft_scale_full.md")
    spark.stop()
  }
}
