package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class MixingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (0L until 300L).map { i =>
    val src = Seq("web", "books", "code")(i.toInt % 3)
    (i, src, ("w " * (1 + (i * 11 % 37)).toInt).trim)
  }.toDF("doc_id", "source", "text").repartition(7)

  private val weights = Map("web" -> 0.5, "books" -> 0.5)

  test("allocateByTokenBudget == the single-window per-source reference") {
    val budget = 800L
    val got = Mixing.allocateByTokenBudget(docs, "doc_id", "text", "source",
        weights, budget)
      .as[(Long, String, Long)].collect().sorted.toSeq
    val w = Window.partitionBy("source").orderBy(md5(col("text")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = docs
      .withColumn("n_tokens", graft.functions.TextFunctions.tokenCount(col("text")))
      .withColumn("alloc",
        when(col("source") === "web", lit(400L))
          .when(col("source") === "books", lit(400L)).otherwise(lit(0L)))
      .withColumn("before", coalesce(sum("n_tokens").over(w), lit(0L)))
      .filter(col("alloc") > 0 && col("before") + col("n_tokens") <= col("alloc"))
      .select("doc_id", "source", "n_tokens")
      .as[(Long, String, Long)].collect().sorted.toSeq
    assert(got == expected)
    assert(got.nonEmpty && got.size < 200) // a real partial selection
  }

  test("per-source token totals never exceed the allocation; zero-weight sources vanish") {
    val got = Mixing.allocateByTokenBudget(docs, "doc_id", "text", "source",
      weights, totalBudget = 500L)
    val totals = got.groupBy("source").agg(sum("n_tokens").as("t"))
      .as[(String, Long)].collect().toMap
    assert(totals.keySet.subsetOf(Set("web", "books"))) // no "code"
    assert(totals.values.forall(_ <= 250L))
  }

  test("allocateWithEpochs: full passes + deterministic partial, never exceeding alloc") {
    // web/books each get 2000 tokens; make books tiny so it upsamples
    // (deterministic subset — a limit() would pick different rows per
    // evaluation and this test evaluates the plan several times)
    val small = docs.filter(col("source") =!= "books" ||
      (col("source") === "books" && col("doc_id") < 60))
    val budget = 4000L
    val got = Mixing.allocateWithEpochs(small, "doc_id", "text", "source",
      weights, budget)
    val perSrc = got.groupBy("source")
      .agg(sum("n_tokens").as("t"), max("epoch").as("maxEpoch"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val avail = small
      .withColumn("n", graft.functions.TextFunctions.tokenCount(col("text")))
      .groupBy("source").agg(sum("n").as("t"))
      .as[(String, Long)].collect().toMap
    // never-exceed per source, and the small source repeated (epoch >= 1)
    assert(perSrc("web")._1 <= 2000L && perSrc("books")._1 <= 2000L)
    assert(perSrc("books")._2 >= 1L, s"books should upsample: $perSrc vs $avail")
    // every full epoch contains the whole source exactly once
    val booksIds = small.filter(col("source") === "books")
      .select("doc_id").as[Long].collect().toSet
    val epoch0 = got.filter(col("source") === "books" && col("epoch") === 0)
      .select("doc_id").as[Long].collect().toSet
    assert(epoch0 == booksIds)
    // the partial (last) epoch is the plain allocator run at the remainder
    val booksT = avail("books")
    val epochs = 2000L / booksT
    val rem = 2000L - epochs * booksT
    val partial = got.filter(col("source") === "books" && col("epoch") === epochs)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val expectedPartial = Mixing.allocateByTokenBudget(
        small.filter(col("source") === "books"), "doc_id", "text", "source",
        Map("books" -> 1.0), totalBudget = math.max(rem, 1L))
      .select("doc_id").as[Long].collect().sorted.toSeq
    if (rem > 0) assert(partial == expectedPartial) else assert(partial.isEmpty)
  }

  test("allocateWithEpochs degenerates to allocateByTokenBudget when no source upsamples") {
    val budget = 500L // well under every source's total
    val got = Mixing.allocateWithEpochs(docs, "doc_id", "text", "source",
        weights, budget)
      .as[(Long, String, Long, Long)].collect().sorted.toSeq
    val plain = Mixing.allocateByTokenBudget(docs, "doc_id", "text", "source",
        weights, budget)
      .as[(Long, String, Long)].collect()
      .map { case (id, s, n) => (id, s, n, 0L) }.sorted.toSeq
    assert(got == plain)
  }

  test("epoch generation crosses the 4096-epoch block boundary without gaps") {
    // one 1-token doc, budget 10000 → epochs 0..9999 span three explode
    // blocks; the two-level explode must emit every epoch exactly once
    val tiny = Seq((1L, "books", "w")).toDF("doc_id", "source", "text")
    val got = Mixing.allocateWithEpochs(tiny, "doc_id", "text", "source",
        Map("books" -> 1.0), totalBudget = 10000L)
      .select("epoch").as[Long].collect().sorted.toSeq
    assert(got == (0L until 10000L).toSeq)
  }

  test("allocateByTemperature == driver BigInt reference; α interpolates toward uniform") {
    val budget = 900L
    // driver reference: per-source totals → q = floor(sqrt(c)·2^20) →
    // alloc = floor(B·q/Σq) in BigInt, then the same window take
    val totals = docs
      .withColumn("n_tokens", graft.functions.TextFunctions.tokenCount(col("text")))
      .groupBy("source").agg(sum("n_tokens").as("c"))
      .as[(String, Long)].collect().toMap
    def refAllocs(alpha: Double): Map[String, Long] = {
      val q = totals.map { case (s, c) =>
        s -> BigInt(math.floor(math.sqrt(c.toDouble) * (1L << 20)).toLong)
      }.filter(_._2 > 0)
      val sumQ = q.values.sum
      require(alpha == 0.5)
      q.map { case (s, qs) => s -> (BigInt(budget) * qs / sumQ).toLong }
        .filter(_._2 > 0)
    }
    val allocs = refAllocs(0.5)
    val w = Window.partitionBy("source").orderBy(md5(col("text")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val allocExpr = allocs.foldLeft(lit(0L)) { case (acc, (s, a)) =>
      when(col("source") === s, lit(a)).otherwise(acc)
    }
    val expected = docs
      .withColumn("n_tokens", graft.functions.TextFunctions.tokenCount(col("text")))
      .withColumn("alloc", allocExpr)
      .withColumn("before", coalesce(sum("n_tokens").over(w), lit(0L)))
      .filter(col("alloc") > 0 && col("before") + col("n_tokens") <= col("alloc"))
      .select("doc_id", "source", "n_tokens")
      .as[(Long, String, Long)].collect().sorted.toSeq
    val got = Mixing.allocateByTemperature(docs, "doc_id", "text", "source",
        alpha = 0.5, totalBudget = budget)
      .as[(Long, String, Long)].collect().sorted.toSeq
    assert(got == expected && got.nonEmpty)
    // partitioning invariance
    val rep = Mixing.allocateByTemperature(docs.repartition(13), "doc_id",
        "text", "source", alpha = 0.5, totalBudget = budget)
      .as[(Long, String, Long)].collect().sorted.toSeq
    assert(rep == got)
  }

  test("allocateByTemperature: α=1 matches natural proportions, α=0 equalizes") {
    def takenTokens(alpha: Double): Map[String, Long] =
      Mixing.allocateByTemperature(docs, "doc_id", "text", "source",
          alpha, totalBudget = 600L)
        .groupBy("source").agg(sum("n_tokens").as("t"))
        .as[(String, Long)].collect().toMap
    val natural = docs
      .withColumn("n_tokens", graft.functions.TextFunctions.tokenCount(col("text")))
      .groupBy("source").agg(sum("n_tokens").as("c"))
      .as[(String, Long)].collect().toMap
    val at1 = takenTokens(1.0)
    val at0 = takenTokens(0.0)
    // α=0: every source's ALLOCATION is floor(B/3)=200 (uniform weights);
    // the take fills it to within one document of 200 per source
    assert(at0.keySet == natural.keySet)
    assert(at0.values.forall(t => t <= 200L))
    // α=1 allocations track natural shares: the largest source keeps the
    // largest take, and the spread RATIO between extremes exceeds α=0's
    val spread = (m: Map[String, Long]) =>
      m.values.max.toDouble / m.values.min.max(1L)
    assert(spread(at1) >= spread(at0))
    // never-exceed per source at any α
    assert(at1.values.sum <= 600L && at0.values.sum <= 600L)
  }

  test("allocateByWeightTable == allocateByTemperature(α=1) on token-count weights") {
    // weights ∝ per-source token counts: the Q20 scaling of α=1 cancels
    // in floor(B·w/Σw), so the two allocators must agree row-for-row
    val counts = docs
      .withColumn("n", graft.functions.TextFunctions.tokenCount(col("text")))
      .groupBy("source").agg(sum("n").as("weight_q"))
    val viaTable = Mixing.allocateByWeightTable(docs, "doc_id", "text",
        "source", counts, "weight_q", totalBudget = 300L)
      .as[(Long, String, Long)].collect().sorted.toSeq
    val viaTemp = Mixing.allocateByTemperature(docs, "doc_id", "text",
        "source", alpha = 1.0, totalBudget = 300L)
      .as[(Long, String, Long)].collect().sorted.toSeq
    assert(viaTable == viaTemp && viaTable.nonEmpty)
    // a source missing from the weight table contributes nothing
    val partial = Mixing.allocateByWeightTable(docs, "doc_id", "text",
      "source", counts.filter(col("source") =!= "a"), "weight_q", 300L)
    assert(partial.filter(col("source") === "a").count() == 0L)
    // non-positive weights drop their source
    val zeroed = counts.withColumn("weight_q",
      when(col("source") === "b", lit(0L)).otherwise(col("weight_q")))
    assert(Mixing.allocateByWeightTable(docs, "doc_id", "text", "source",
      zeroed, "weight_q", 300L).filter(col("source") === "b").count() == 0L)
  }

  test("allocateByTemperatureBestFirst: same allocations as hash-order, filled by score") {
    // deterministic synthetic score with ties across sources
    val scored = docs.withColumn("score", (col("doc_id") % 7).cast("double") / 7.0)
    val budget = 900L
    val got = Mixing.allocateByTemperatureBestFirst(scored, "doc_id", "text",
        "source", col("score"), alpha = 0.5, totalBudget = budget)
      .as[(Long, String, Long)].collect().sorted.toSeq
    // reference: allocateByTemperature's OWN per-source allocations
    // (derived identically), consumed in (score desc, id) window order
    val base = scored
      .withColumn("n_tokens", graft.functions.TextFunctions.tokenCount(col("text")))
    val c = base.groupBy("source").agg(sum("n_tokens").as("c"))
      .withColumn("q", floor(sqrt(col("c").cast("double")) * (1L << 20)).cast("long"))
      .filter(col("q") > 0)
    val qsum = c.agg(sum("q")).as[Long].head()
    val alloc = c.withColumn("alloc",
      expr(s"(CAST(q AS DECIMAL(38,0)) * CAST($budget AS DECIMAL(38,0))) div $qsum"))
    val w = Window.partitionBy("source")
      .orderBy(col("score").desc_nulls_last, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = base.join(alloc.select("source", "alloc"), "source")
      .withColumn("before", coalesce(sum("n_tokens").over(w), lit(0L)))
      .filter(col("alloc") > 0 && col("before") + col("n_tokens") <= col("alloc"))
      .select("doc_id", "source", "n_tokens")
      .as[(Long, String, Long)].collect().sorted.toSeq
    assert(got == expected)
    assert(got.nonEmpty && got.size < 300) // a real partial selection
    // best-first actually reorders: the hash-order variant picks a
    // different doc set under the same allocations
    val hashOrder = Mixing.allocateByTemperature(scored, "doc_id", "text",
        "source", alpha = 0.5, totalBudget = budget)
      .as[(Long, String, Long)].collect().sorted.toSeq
    assert(got.map(_._1).toSet != hashOrder.map(_._1).toSet)
    // and the selected set is score-top-heavy: every selected doc's score
    // is >= every unselected doc's score within its source, EXCEPT docs
    // skipped only because the remaining budget could not fit them
    val perSrcAlloc = alloc.select("source", "alloc").as[(String, Long)]
      .collect().toMap
    val gotBySrc = got.groupBy(_._2)
    gotBySrc.foreach { case (src, rows) =>
      assert(rows.map(_._3).sum <= perSrcAlloc(src))
    }
  }

  test("the only unbounded-partition window runs over the bucket-sum table") {
    val plan = Mixing.allocateByTokenBudget(docs, "doc_id", "text", "source",
        weights, 500L)
      .queryExecution.optimizedPlan.toString
    val badWindows = plan.linesIterator.filter(l =>
      l.contains("Window") && l.contains("n_tokens#") &&
        !l.contains("__bucket")).toSeq
    assert(badWindows.isEmpty, plan)
  }
}
