package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("exact regime (distinct <= k): equals the exact count map, partitioning-free") {
    val df = (Seq.fill(7)("a") ++ Seq.fill(4)("b") ++ Seq.fill(4)("c") ++
      Seq("d") ++ Seq(null.asInstanceOf[String])).toDF("t")
    def run(d: org.apache.spark.sql.DataFrame) =
      d.agg(HeavyHitters.sketch(col("t"), k = 10).as("hh"))
        .select(explode(col("hh")).as("e")).select("e.item", "e.count_lb")
        .as[(String, Long)].collect().toSeq
    val got = run(df)
    // count desc, item asc — ties (b, c) break by item; null skipped
    assert(got == Seq(("a", 7L), ("b", 4L), ("c", 4L), ("d", 1L)))
    assert(run(df.repartition(13)) == got)
  }

  test("approximate regime: heavy items survive with the n/(k+1) bound") {
    val hot = Seq.fill(4000)("hot1") ++ Seq.fill(3000)("hot2")
    val noise = (1 to 10000).map(i => s"u$i")
    val n = hot.size + noise.size // 17000
    val k = 10
    val slack = n / (k + 1) // 1545
    for (parts <- Seq(1, 17)) {
      val got = hot.concat(noise).toDF("t").repartition(parts)
        .agg(HeavyHitters.sketch(col("t"), k).as("hh"))
        .select(explode(col("hh")).as("e")).select("e.item", "e.count_lb")
        .as[(String, Long)].collect().toMap
      // both hot items exceed n/(k+1): guaranteed present
      assert(got.contains("hot1") && got.contains("hot2"), s"parts=$parts $got")
      // counts underestimate by at most n/(k+1), never overestimate
      assert(got("hot1") <= 4000 && got("hot1") >= 4000 - slack)
      assert(got("hot2") <= 3000 && got("hot2") >= 3000 - slack)
      // never more than k counters survive
      assert(got.size <= k)
    }
  }

  test("registers on the SQL surface") {
    GraftFunctions.register(spark)
    Seq("a", "a", "b").toDF("t").createOrReplaceTempView("hh_t")
    val got = spark.sql(
      "SELECT misra_gries(t, 4) AS hh FROM hh_t").head().getSeq[Any](0)
    assert(got.size == 2)
  }
}
