package graft.tools

import graft.Queries
import graft.functions.TextFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage timing of the ngram prefix-filter join. */
object NgramProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Queries.table(spark, sfDir, "documents")
    val ex = docs.select(col("doc_id").as("id"),
        explode(TextFunctions.wordShingles(col("text"), 3)).as("tok"))
      .select(col("id"), xxhash64(col("tok")).as("h"))
    time("explode+hash count")(println(ex.count()))
    val freq = ex.groupBy("h").agg(count(lit(1)).as("freq"))
    time("freq table")(println(freq.count()))
    val sets = ex.join(freq, "h").groupBy("id")
      .agg(sort_array(collect_list(struct(col("freq"), col("h")))).as("fh"))
      .select(col("id"),
        transform(col("fh"), x => x("h")).as("dfo"),
        array_sort(transform(col("fh"), x => x("h"))).as("hs"),
        size(col("fh")).as("sz"))
    val persisted = sets.persist()
    time("sets materialize")(println(persisted.count()))
    val prefixLen = (col("sz") - ceil(col("sz") * 0.5) + 1).cast("int")
    val prefixes = persisted.select(col("id"), col("sz"),
      explode(slice(col("dfo"), lit(1), prefixLen)).as("tok"))
    time("prefix rows")(println(prefixes.count()))
    val cands = prefixes.select(col("tok"), col("id").as("id1"), col("sz").as("sz1"))
      .join(prefixes.select(col("tok"), col("id").as("id2"), col("sz").as("sz2")), Seq("tok"))
      .filter(col("id1") < col("id2"))
      .filter(least(col("sz1"), col("sz2")).cast("double") >=
        lit(0.5 / 1.5) * (col("sz1") + col("sz2")))
      .select("id1", "id2").distinct()
    time("candidates")(println(cands.count()))
    val s1 = persisted.select(col("id").as("id1"), col("hs").as("hs1"), col("sz").as("sz1"))
    val s2 = persisted.select(col("id").as("id2"), col("hs").as("hs2"), col("sz").as("sz2"))
    val out = cands.join(s1, "id1").join(s2, "id2")
      .withColumn("inter",
        graft.functions.SortedIntersectCount.column(col("hs1"), col("hs2")).cast("double"))
      .withColumn("jaccard", col("inter") / (col("sz1") + col("sz2") - col("inter")))
      .filter(col("jaccard") >= 0.5)
    time("verify")(println(out.count()))
    spark.stop()
  }
}
