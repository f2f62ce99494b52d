package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Graph-row decade probe over the DERIVED corpora — the round-15 tool
  * that the part-key shift in [[ScaleTen.derive]] makes honest: with
  * l_partkey shifted per replica the parts-co-ordered graph is k disjoint
  * copies of the base graph (verified: 1.196M → 11.96M distinct edges,
  * exactly ×10.00), so a healthy m^1.5-bounded plan should show ~flat
  * per-edge cost across decades ONCE the shuffle is sized to the data
  * (unshifted keys DENSIFIED the one shared part universe — degree ×10,
  * wedges ×100 — and the sweep measured a different workload entirely).
  *
  * Protocol (the q_pagerank fresh-JVM lesson, round 14): ONE (query,
  * dir, partitions) combination per JVM — a first shared-JVM version of
  * this tool measured q_pagerank at 65 s on sf0.1 (isolated truth ~7 s)
  * right after a spilling 10×-decade row; graph rows are uniquely
  * sensitive to JVM history, so each probe gets a fresh heap. Warm-up
  * run + median of `runs` timed runs, Bench-style.
  *
  * Run per combo:
  *   java -Xmx8g … graft.tools.GraphSweep <sfDir> <query> [partitions] [runs]
  * Derive first: sbt 'runMain graft.tools.ScaleTen' (or GraphSweep with
  * query = "derive" and sfDir = the sf0.1 source, out dir as partitions
  * slot).
  */
object GraphSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val query = args.lift(1).getOrElse("q_triangles")
    val parts = args.lift(2).getOrElse("32")
    val runs = args.lift(3).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      // derive mode reuses the partitions slot as the OUT DIR — it must
      // not reach the int-typed shuffle conf (r16: the derive path threw
      // INVALID_CONF_VALUE before deriving anything)
      .config("spark.sql.shuffle.partitions",
        if (query == "derive") "32" else parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (query == "derive") {
      ScaleTen.derive(spark, dir, parts) // partitions slot = out dir
      spark.stop(); return
    }

    def time(d: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(query)(spark, d)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    def quiesce(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc(); Thread.sleep(200)
    }
    // codegen/classloader warm-up against the dir UNDER TEST (a separate
    // hardcoded warm-up dir broke on hosts without that path and warmed
    // against a different dataset; an extra run of the same combo is the
    // Bench protocol anyway — warm-up + median of timed runs)
    time(dir)
    quiesce()
    val times = (1 to runs).map { _ =>
      val t = time(dir); quiesce(); t
    }.sorted
    println(f"GRAPHSWEEP $query $dir parts=$parts median=${times(times.length / 2)}%.2f all=${times.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
