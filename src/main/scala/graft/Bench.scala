package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query seconds.
  *
  * Protocol (BASELINE.md): per query, one warm-up execution (JIT + codegen
  * warm), then the median of `BENCH_RUNS` timed runs. Queries execute into
  * the `noop` sink so every projected column is materialized — `.count()`
  * would let column pruning skip the actual work of projection-heavy
  * queries.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // The battery's only global windows are over BOUNDED inputs (bucket
    // sums in Mixing/Chunking, k-row top tables in Search, the oracle rank
    // projection in q_shuffle_export) — each declares partitionBy(lit(0))
    // to state that intent, but Spark 4's EliminateWindowPartitions rule
    // strips foldable partition keys, so WindowExec still logs its
    // single-partition WARN. Those warnings are known-safe here; silence
    // that one logger so a real unbounded-window mistake elsewhere stays
    // visible in the log.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)

    def execute(name: String): Unit = {
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      // operators persist shared intermediates (Dedup.materialized); drop
      // them so every timed run measures the query, not a cache read
      spark.catalog.clearCache()
    }

    // Queries run alphabetically; without a barrier a trivial scan inherits
    // seconds of GC/BlockManager churn from a heavy predecessor (r1 bench:
    // q_lt 4.7s right after q_lang_id vs q_gt 0.12s). Reset between queries
    // so per-query numbers are attributable.
    def quiesce(): Unit = {
      spark.catalog.clearCache()
      System.gc()
      Thread.sleep(200)
    }

    // local-iteration filter (driver leaves it unset → full battery)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val results = names.map { name =>
      val t = try {
        execute(name) // warm-up
        val times = (1 to runs).map { _ =>
          quiesce()
          val t0 = System.nanoTime()
          execute(name)
          (System.nanoTime() - t0) / 1e9
        }.sorted
        times(times.length / 2)
      } catch { case _: Throwable => -1.0 }
      name -> t
    }
    // The driver captures only the last 2000 chars of output, and a
    // 90+-query map at full double precision overflows it (BENCH_r05.json:
    // "parsed": null — only the tail of the line survived). So: the FULL
    // per-query map goes to BENCH_FULL.json (committed with the repo), and
    // the stdout JSON line inlines the slowest queries up to a fixed
    // character budget — those are the rows a perf audit needs first.
    def fmt(v: Double): String =
      if (v < 0) "-1"
      else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val total = results.map(_._2).filter(_ >= 0).sum
    val fullQs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val fullLine =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n":${results.size},"queries":$fullQs,"sf":"$sfDir"}"""
    try
      java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_FULL.json"),
        (fullLine + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () } // stdout line is the contract; file is best-effort
    val budget = 1600 // chars for the inline map; total line stays < ~1780
    val sb = new StringBuilder
    var kept = 0
    // stop at the FIRST entry that doesn't fit so the inline map is a
    // strict slowest-first prefix — continuing would let a fast query
    // with a short name slip in ahead of a skipped slower one
    val it = results.sortBy(-_._2).iterator
    var full = false
    while (it.hasNext && !full) {
      val (k, v) = it.next()
      val entry = (if (kept > 0) "," else "") + "\"" + k + "\":" + fmt(v)
      if (sb.length + entry.length <= budget) { sb.append(entry); kept += 1 }
      else full = true
    }
    println(
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n":${results.size},"queries":{$sb},"sf":"$sfDir","full":"BENCH_FULL.json"}""")
    spark.stop()
  }
}
