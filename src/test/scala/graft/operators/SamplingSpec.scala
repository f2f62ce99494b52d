package graft.operators

import graft.SparkSpec
import graft.functions.TopN
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha", "en"), (2L, "bravo", "en"), (3L, "charlie", "en"),
    (4L, "delta", "en"), (5L, "eins", "de"), (6L, "zwei", "de"),
    (7L, "drei", "de"), (8L, "uno", "es")
  ).toDF("id", "text", "lang")

  test("stratifiedExactN equals the window row_number formulation") {
    val w = Window.partitionBy("lang").orderBy(md5(col("text")), col("id"))
    val expected = docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).drop("rn")
      .as[(Long, String, String)].collect().sorted.toSeq
    val got = Sampling.stratifiedExactN(docs, Seq("lang"), 2,
        Seq(md5(col("text")), col("id")))
      .as[(Long, String, String)].collect().sorted.toSeq
    assert(got == expected && got.size == 2 + 2 + 1) // es has only one row
  }

  test("stratifiedExactN plans as ObjectHashAggregate, not a window sort") {
    val plan = Sampling.stratifiedExactN(docs, Seq("lang"), 2, Seq(col("id")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("TopN.rows keeps rank order, handles ties and n > group size") {
    val df = Seq((1, 30), (1, 10), (1, 20), (1, 10), (2, 5))
      .toDF("k", "v")
    val got = df.groupBy("k")
      .agg(TopN.rows(struct(col("v")), struct(col("v")), n = 3, isMax = false).as("top"))
      .select(col("k"), col("top.v").as("vs"))
      .as[(Int, Seq[Int])].collect().toMap
    assert(got(1) == Seq(10, 10, 20)) // both tied 10s kept, ascending
    assert(got(2) == Seq(5))          // n larger than the group
    val gotMax = df.groupBy("k")
      .agg(TopN.rows(struct(col("v")), struct(col("v")), n = 2, isMax = true).as("top"))
      .select(col("k"), col("top.v").as("vs"))
      .as[(Int, Seq[Int])].collect().toMap
    assert(gotMax(1) == Seq(30, 20)) // descending rank order
  }

  test("TopN.rows survives serialize/merge across many partitions") {
    val df = spark.range(1000).repartition(13)
      .select((col("id") % 4).as("k"), col("id").as("v"))
    val got = df.groupBy("k")
      .agg(TopN.rows(struct(col("v")), struct(col("v")), n = 3, isMax = false).as("top"))
      .select(col("k"), col("top.v").as("vs"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(got(0L) == Seq(0L, 4L, 8L) && got(3L) == Seq(3L, 7L, 11L))
  }

  test("uniformExactN takes the globally smallest n, deterministic") {
    val got = Sampling.uniformExactN(docs, 3, Seq(md5(col("text")), col("id")))
      .select("id").as[Long].collect().toSeq
    val expected = docs.select(col("id"), md5(col("text")).as("h"))
      .as[(Long, String)].collect().sortBy(r => (r._2, r._1)).take(3).map(_._1).toSeq
    assert(got == expected)
  }

  test("assignSplit is stable per key, partitioning-independent, ~fractional") {
    val big = (0L until 2000L).map(i => (i, s"doc $i")).toDF("id", "text")
    val fr = Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125)
    val a = Sampling.assignSplit(big, col("id"), fr)
      .select("id", "split").as[(Long, String)].collect().toMap
    val b = Sampling.assignSplit(big.repartition(13), col("id"), fr)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a == b) // partitioning-independent
    val counts = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") - 1500) < 100)
    assert(math.abs(counts("val") - 250) < 60)
    assert(math.abs(counts("test") - 250) < 60)
    // growing the table never reassigns an existing key
    val grown = Sampling.assignSplit(
        (0L until 3000L).map(i => (i, s"doc $i")).toDF("id", "text"), col("id"), fr)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a.forall { case (k, v) => grown(k) == v })
  }

  test("assignSplit keyed on a group column moves whole groups together") {
    val grouped = Sampling.assignSplit(docs, col("lang"),
      Seq("train" -> 0.5, "test" -> 0.5))
    val perLang = grouped.groupBy("lang")
      .agg(countDistinct(col("split")).as("n"))
      .select("n").as[Long].collect()
    assert(perLang.forall(_ == 1L))
  }

  test("sampleByFraction: deterministic, per-stratum rates, unlisted strata drop") {
    val df = (1L to 4000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "g")
    val fracs = Map("a" -> 0.25, "b" -> 1.0)
    val got = Sampling.sampleByFraction(df, col("id"), "g", fracs)
    val byG = got.groupBy("g").count().as[(String, Long)].collect().toMap
    // b keeps everything; a lands near 25% (Bernoulli, 2000 draws)
    assert(byG("b") == 2000L)
    assert(byG("a") > 350L && byG("a") < 650L, s"a=${byG("a")}")
    // unlisted stratum drops entirely
    val dropped = Sampling.sampleByFraction(df, col("id"), "g", Map("a" -> 0.5))
    assert(dropped.filter(col("g") === "b").count() == 0L)
    // stable: same ids survive under a different partitioning
    val ids1 = got.select("id").as[Long].collect().toSet
    val ids2 = Sampling.sampleByFraction(df.repartition(13), col("id"), "g", fracs)
      .select("id").as[Long].collect().toSet
    assert(ids1 == ids2)
    // fraction 0 keeps nothing
    assert(Sampling.sampleByFraction(df, col("id"), "g", Map("a" -> 0.0))
      .count() == 0L)
  }

  test("selectTopUnderTokenBudget equals the single-window formulation") {
    // scores engineered for ties (2 and 5), a NULL (6), and sub-bucket
    // clusters; token counts = word counts
    val d = Seq(
      (1L, "a b c", 0.9), (2L, "d e", 0.7), (3L, "f g h i", 0.7),
      (4L, "j", 0.5), (5L, "k l m", 0.95), (6L, "n o", Double.NaN),
      (7L, "p q r s t", 0.1)
    ).toDF("id", "text", "q0")
      .withColumn("score", when(col("id") === 6L, lit(null)).otherwise(col("q0")))
      .drop("q0")
    val w = Window.orderBy(col("score").desc_nulls_last, col("id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val expected = d.withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("cum_tokens", sum("n_tokens").over(w))
      .filter(col("cum_tokens") <= 9L)
      .as[(Long, String, Option[Double], Long, Long)].collect().sortBy(_._1).toSeq
    val got = Sampling.selectTopUnderTokenBudget(d, "id", "text",
        col("score"), budgetTokens = 9L)
      .as[(Long, String, Option[Double], Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == expected)
    // budget 9: 5 (3 toks, cum 3) + 1 (3, cum 6) + 2 (2, cum 8) survive;
    // tie partner 3 (4 toks, cum 12) overflows — and PREFIX semantics
    // drop everything below the cutoff too, including 1-token doc 4
    assert(got.map(_._1) == Seq(1L, 2L, 5L))
  }

  test("selectTopUnderTokenBudget: prefix cutoff, NULL-last, boundary fit, tiny budget") {
    val d = Seq(
      (10L, "a a a a", 1.0), (20L, "b b b", 0.8), (30L, "c", 0.6)
    ).toDF("id", "text", "score")
    // exact boundary: budget 7 fits docs 10+20 exactly
    val fit = Sampling.selectTopUnderTokenBudget(d, "id", "text",
        col("score"), budgetTokens = 7L)
      .select("id", "cum_tokens").as[(Long, Long)].collect().sortBy(_._1)
    assert(fit.toSeq == Seq((10L, 4L), (20L, 7L)))
    // budget below the best doc → empty selection
    assert(Sampling.selectTopUnderTokenBudget(d, "id", "text",
      col("score"), budgetTokens = 3L).count() == 0L)
    // all-NULL scores: order degrades to id, budget still respected
    val nulls = d.withColumn("score", lit(null).cast("double"))
    val byId = Sampling.selectTopUnderTokenBudget(nulls, "id", "text",
        col("score"), budgetTokens = 7L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(byId == Seq(10L, 20L))
    // a NaN score ranks last like NULL — and must not error at the
    // bucket floor's ANSI long cast
    val withNan = d.withColumn("score",
      when(col("id") === 10L, lit(Double.NaN)).otherwise(col("score")))
    val nanSel = Sampling.selectTopUnderTokenBudget(withNan, "id", "text",
        col("score"), budgetTokens = 4L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(nanSel == Seq(20L, 30L)) // 20 (0.8, 3) + 30 (0.6, 1); NaN-10 last
    // invalid budget rejected
    intercept[IllegalArgumentException] {
      Sampling.selectTopUnderTokenBudget(d, "id", "text", col("score"), 0L)
    }
  }

  test("splitLeakage reports exactly the cross-split pairs; cluster assignment has none") {
    val d = (0L until 100L).toDF("id")
    val fracs = Seq("a" -> 0.5, "b" -> 0.5)
    val assigned = Sampling.assignSplit(d, col("id"), fracs)
    val byId = assigned.as[(Long, String)].collect().toMap
    // craft one cross-split and one same-split pair from the actual coins
    val aId = byId.collectFirst { case (i, "a") => i }.get
    val bId = byId.collectFirst { case (i, "b") => i }.get
    val a2 = byId.collectFirst { case (i, "a") if i != aId => i }.get
    val pairs = Seq((aId, bId), (aId, a2)).toDF("id1", "id2")
    val leak = Sampling.splitLeakage(assigned, "id", "split", pairs)
      .as[(Long, Long, String, String)].collect().toSeq
    assert(leak == Seq((aId, bId, "a", "b")))
    // cluster-keyed assignment: chain {0,1,2} and pair {10,11} each land
    // whole; isolated docs keep their own id as component; leakage empty
    val cPairs = Seq((0L, 1L), (1L, 2L), (10L, 11L)).toDF("id1", "id2")
    val clustered = Sampling.assignSplitByCluster(d, "id", cPairs, fracs)
    val rows = clustered.select("id", "component", "split")
      .as[(Long, Long, String)].collect()
    val comp = rows.map(r => r._1 -> r._2).toMap
    val split = rows.map(r => r._1 -> r._3).toMap
    assert(Seq(0L, 1L, 2L).map(comp) == Seq(0L, 0L, 0L))
    assert(Seq(10L, 11L).map(comp) == Seq(10L, 10L))
    assert(comp(50L) == 50L) // isolated
    assert(split(0L) == split(1L) && split(1L) == split(2L))
    assert(split(10L) == split(11L))
    assert(Sampling.splitLeakage(clustered, "id", "split", cPairs).count() == 0L)
    // the coin is the COMPONENT's assignSplit coin: docs 0,1,2 all get
    // key-0's coin, isolated docs keep their own
    assert(Seq(0L, 1L, 2L).map(split).forall(_ == byId(0L)))
    assert(split(50L) == byId(50L))
    // both splits populated at these fractions over 98 clusters
    assert(rows.map(_._3).toSet == Set("a", "b"))
  }

  test("selectTopUnderTokenBudget never windows over a single global partition") {
    val d = Seq((1L, "a b", 0.5), (2L, "c", 0.9)).toDF("id", "text", "score")
    val plan = Sampling.selectTopUnderTokenBudget(d, "id", "text",
        col("score"), budgetTokens = 10L)
      .queryExecution.optimizedPlan.toString
    // the only global (empty-partition-spec) window must be over the
    // bucket-sum aggregate, never over the input rows
    val globalWindows = plan.linesIterator.filter(l =>
      l.contains("Window") && !l.contains("partitionBy") &&
        l.contains("__bucket_sum")).toSeq
    assert(globalWindows.nonEmpty, plan)
  }
}
