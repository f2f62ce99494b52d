package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Measured recall of the approximate ANN tier against exact brute force on
  * the real sf0.01 embeddings (500 × 64-dim) — the three battery queries
  * that stay rows-only in the driver gate are pinned HERE instead: if a
  * parameter change silently collapses recall, this suite fails.
  */
class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(sf("sf0.01") + "/embeddings.parquet")

  private def queryVec(id: Long): Seq[Float] =
    emb.filter(col("vec_id") === id)
      .head().getSeq[Float](emb.columns.indexOf("embedding"))

  private def topIds(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("vec_id").as[Long].collect().toSet

  test("lshTopK recall@10 vs brute force (averaged over 5 queries)") {
    val recalls = (0L to 4L).map { qid =>
      val q = queryVec(qid)
      val rest = emb.filter(col("vec_id") =!= qid)
      val exact = topIds(Similarity.bruteForceTopK(rest, "vec_id", "embedding", q, 10))
      val approx = topIds(Similarity.lshTopK(rest, "vec_id", "embedding", q, 10,
        planes = 4, tables = 8))
      exact.intersect(approx).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    info(f"lshTopK mean recall@10 = $mean%.2f (per-query: ${recalls.mkString(", ")})")
    assert(mean >= 0.5, f"LSH recall collapsed: $mean%.2f")
  }

  test("ivfTopK recall@10 vs brute force (averaged over 5 queries)") {
    val idx = Similarity.ivfIndexFor(emb, cacheKey = "recall-spec-sf001",
      "vec_id", "embedding", nClusters = 16)
    val recalls = (0L to 4L).map { qid =>
      val q = queryVec(qid)
      val exact = topIds(Similarity.bruteForceTopK(
        emb.filter(col("vec_id") =!= qid), "vec_id", "embedding", q, 10))
      val approx = topIds(Similarity.ivfTopK(idx, "vec_id", "embedding", q, 11, nprobe = 4)
        .filter(col("vec_id") =!= qid).limit(10))
      exact.intersect(approx).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    info(f"ivfTopK mean recall@10 (nprobe=4/16) = $mean%.2f")
    assert(mean >= 0.6, f"IVF recall collapsed: $mean%.2f")
  }

  test("density-scaled IVF sizing: √n rule, derived k in the memo key, recall holds") {
    // the rule itself: √n clamped to [2, n]
    assert(Similarity.ivfClustersForCorpus(1L) == 1)   // k ≤ n feasibility floor wins
    assert(Similarity.ivfClustersForCorpus(4L) == 2)
    assert(Similarity.ivfClustersForCorpus(100L) == 10)
    assert(Similarity.ivfClustersForCorpus(1000000L) == 1000)
    intercept[IllegalArgumentException](Similarity.ivfClustersForCorpus(0L))
    // nClusters = 0 derives from the corpus: sf0.01 embeddings = 500 rows
    val n = emb.count()
    val expectK = Similarity.ivfClustersForCorpus(n)
    val idx = Similarity.ivfIndexFor(emb, cacheKey = "recall-spec-tuned",
      "vec_id", "embedding", nClusters = 0)
    assert(idx.centroids.length == expectK,
      s"derived k: expected $expectK for n=$n, got ${idx.centroids.length}")
    // nprobe = all clusters ⇒ IVF is exactly brute force (the battery
    // row's oracle argument); recall at a PRUNED probe stays sane too
    val q = queryVec(0L)
    val exact = topIds(Similarity.bruteForceTopK(
      emb.filter(col("vec_id") =!= 0L), "vec_id", "embedding", q, 10))
    val all = topIds(Similarity.ivfTopK(idx, "vec_id", "embedding", q, 11,
        nprobe = idx.centroids.length)
      .filter(col("vec_id") =!= 0L).limit(10))
    assert(all == exact)
    // pruned-probe recall at the derived k (averaged over 5 queries, the
    // same protocol as the fixed-k test above)
    val recalls = (0L to 4L).map { qid =>
      val qv = queryVec(qid)
      val ex = topIds(Similarity.bruteForceTopK(
        emb.filter(col("vec_id") =!= qid), "vec_id", "embedding", qv, 10))
      val ap = topIds(Similarity.ivfTopK(idx, "vec_id", "embedding", qv, 11,
          nprobe = math.max(2, expectK / 4))
        .filter(col("vec_id") =!= qid).limit(10))
      ex.intersect(ap).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    info(f"tuned-k ivfTopK mean recall@10 (nprobe=${math.max(2, expectK / 4)}/$expectK) = $mean%.2f")
    assert(mean >= 0.5, f"tuned-k pruned-probe recall collapsed: $mean%.2f")
  }

  test("pqTopK (ADC) recall@10 vs exact L2 brute force, and plan shape") {
    val cb = Similarity.pqCodebookFor(emb.select("embedding"),
      cacheKey = "recall-spec-pq", "embedding", m = 8, k = 16)
    val encoded = Similarity.pqEncodeTable(emb, "vec_id", "embedding", cb)
      .persist()
    // codes are valid and deterministic under repartitioning
    val codes = encoded.select(col("id"), col("code")).as[(Long, Seq[Int])]
      .collect().toMap
    assert(codes.values.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 16)))
    val again = Similarity.pqEncodeTable(emb.repartition(13), "vec_id", "embedding", cb)
      .as[(Long, Seq[Int])].collect().toMap
    assert(codes == again)
    val recalls = (0L to 4L).map { qid =>
      val q = queryVec(qid)
      // exact squared-L2 ranking (what ADC approximates)
      val exact = emb.filter(col("vec_id") =!= qid)
        .select(col("vec_id"),
          aggregate(zip_with(col("embedding").cast("array<double>"),
              typedLit(q.map(_.toDouble)), (x, y) => (x - y) * (x - y)),
            lit(0.0), (a, v) => a + v).as("d"))
        .orderBy(col("d").asc, col("vec_id")).limit(10)
        .select("vec_id").as[Long].collect().toSet
      val approx = Similarity.pqTopK(encoded.filter(col("id") =!= qid), q, cb, 10)
        .select("id").as[Long].collect().toSet
      exact.intersect(approx).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    // ADC alone with 32-bit codes is the SHORTLIST generator, not the
    // final ranking (measured 0.26 here) — guard collapse only
    info(f"pqTopK (ADC-alone) mean recall@10 (m=8,k=16) = $mean%.2f")
    assert(mean >= 0.15, f"PQ ADC recall collapsed: $mean%.2f")
    // the production shape: ADC shortlist-100 + exact rerank
    val rerankRecalls = (0L to 4L).map { qid =>
      val q = queryVec(qid)
      val rest = emb.filter(col("vec_id") =!= qid)
      val exact = topIds(Similarity.bruteForceTopK(rest, "vec_id", "embedding", q, 10))
      val approx = topIds(Similarity.pqTopKRerank(
        encoded.filter(col("id") =!= qid), rest, "vec_id", "embedding", q, cb,
        k = 10, shortlist = 100))
      exact.intersect(approx).size / 10.0
    }
    val rerankMean = rerankRecalls.sum / rerankRecalls.size
    info(f"pqTopKRerank mean recall@10 (shortlist=100/500) = $rerankMean%.2f")
    assert(rerankMean >= 0.7, f"PQ rerank recall collapsed: $rerankMean%.2f")
    // ADC scan is narrow + TakeOrdered: no join, no shuffle
    val plan = Similarity.pqTopK(encoded, queryVec(0L), cb, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject") && !plan.contains("Exchange"), plan)
    encoded.unpersist()
  }

  test("int8 quantization: driver-mirror codes, integer top-k mirror, rerank recall") {
    val corpus = emb.filter(col("vec_id") =!= 0)
    val qt = Similarity.quantizeInt8(corpus, "vec_id", "embedding")
    // every code equals the driver-side mirror of the same arithmetic
    val rows = corpus.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect()
    val mirror = rows.map { case (id, v) =>
      id -> Similarity.quantizeQueryInt8(v).toSeq
    }.toMap
    val got = qt.as[(Long, Seq[Byte])].collect().toMap
    assert(got.size == mirror.size)
    mirror.foreach { case (id, qv) =>
      assert(got(id).map(_.toInt) == qv, s"codes differ for vec $id")
    }
    // geometry edges: the max-abs component lands on ±127 exactly,
    // half-up rounding at .5, the all-zero vector quantizes to zeros
    val synth = Seq((1L, Seq(2.0f, -2.0f, 1.0f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f))).toDF("id", "vec")
    val sq = Similarity.quantizeInt8(synth, "id", "vec")
      .as[(Long, Seq[Byte])].collect().toMap
    assert(sq(1L) == Seq[Byte](127, -127, 64, 0))
    assert(sq(2L) == Seq[Byte](0, 0, 0, 0))
    // int8TopK == the integer dot-product mirror, ties on ascending id
    val q = queryVec(0L)
    val qq = Similarity.quantizeQueryInt8(q)
    val expectTop = mirror.toSeq.map { case (id, tv) =>
      (id, tv.zip(qq).map { case (a, b) => a.toLong * b.toLong }.sum)
    }.sortBy { case (id, s) => (-s, id) }.take(10)
    val gotTop = Similarity.int8TopK(qt, q, 10)
      .as[(Long, Long)].collect().toSeq
    assert(gotTop == expectTop)
    // byte scan plans as scan -> TakeOrdered: no join, no shuffle
    val plan = Similarity.int8TopK(qt, q, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject") && !plan.contains("Exchange"), plan)
    // rerank recall vs exact cosine (averaged over 5 queries)
    val recalls = (0L to 4L).map { qid =>
      val qv = queryVec(qid)
      val rest = emb.filter(col("vec_id") =!= qid)
      val restQ = Similarity.quantizeInt8(rest, "vec_id", "embedding")
      val exact = topIds(Similarity.bruteForceTopK(rest, "vec_id", "embedding", qv, 10))
      val approx = topIds(Similarity.int8TopKRerank(
        restQ, rest, "vec_id", "embedding", qv, k = 10, shortlist = 50))
      exact.intersect(approx).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    info(f"int8TopKRerank mean recall@10 (shortlist=50/500) = $mean%.2f")
    assert(mean >= 0.7, f"int8 rerank recall collapsed: $mean%.2f")
  }

  test("ivfPqTopK: composed tier == PQ at nprobe=all, pruned plan, rerank recall") {
    val idx = Similarity.ivfIndexFor(emb, cacheKey = "recall-spec-ivfpq-idx",
      "vec_id", "embedding", nClusters = 16)
    val cb = Similarity.pqCodebookFor(emb.select("embedding"),
      cacheKey = "recall-spec-ivfpq-cb", "embedding", m = 8, k = 16)
    val codes = Similarity.ivfPqEncodedFor(idx, cb,
      cacheKey = "recall-spec-ivfpq", "vec_id", "embedding")
    val q = queryVec(0L)
    // nprobe = all clusters ⇒ the composed tier degenerates to exactly
    // the whole-table ADC ranking — the cluster layout must not change
    // a single score or tie-break
    val allProbe = Similarity.ivfPqTopK(idx.centroids, codes, q, cb,
        k = 10, nprobe = idx.centroids.length)
      .as[(Long, Double)].collect().toSeq
    val pqAll = Similarity.pqTopK(codes.select("id", "code"), q, cb, 10)
      .as[(Long, Double)].collect().toSeq
    assert(allProbe == pqAll)
    // the probe plans as a PRUNED scan: cluster partition filter reaches
    // the source, then TakeOrdered — no join, no shuffle
    val pruned = Similarity.ivfPqTopK(idx.centroids, codes, q, cb, k = 10, nprobe = 4)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject") && !plan.contains("Exchange"), plan)
    val optimized = pruned.queryExecution.optimizedPlan.toString
    assert(optimized.contains("__cluster"), optimized)
    // production query: pruned byte scan shortlist + exact float rerank
    val recalls = (0L to 4L).map { qid =>
      val qv = queryVec(qid)
      val exact = topIds(Similarity.bruteForceTopK(
        emb.filter(col("vec_id") =!= qid), "vec_id", "embedding", qv, 10))
      val approx = topIds(Similarity.ivfPqTopKRerank(idx.centroids, codes,
          emb, "vec_id", "embedding", qv, cb, k = 11, nprobe = 8, shortlist = 100)
        .filter(col("vec_id") =!= qid).limit(10))
      exact.intersect(approx).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    info(f"ivfPqTopKRerank mean recall@10 (nprobe=8/16, shortlist=100/500) = $mean%.2f")
    assert(mean >= 0.6, f"IVF-PQ rerank recall collapsed: $mean%.2f")
  }

  test("pqEncode fails loud on a dimension mismatch (no silent null codes)") {
    val cb = Similarity.pqCodebookFor(emb.select("embedding"),
      cacheKey = "recall-spec-pq", "embedding", m = 8, k = 16)
    val short = Seq((1L, Seq(1.0f, 2.0f))).toDF("id", "embedding")
    val ex = intercept[Exception] {
      Similarity.pqEncodeTable(short, "id", "embedding", cb).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(_.getMessage != null) &&
      causes(ex).flatMap(c => Option(c.getMessage)).exists(_.contains("pq_encode")),
      ex.toString)
  }

  test("embeddingPairsLsh pair recall vs exact pairs at the battery parameters") {
    val exact = Dedup.embeddingPairs(emb, "vec_id", "embedding", 0.45)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val lsh = Dedup.embeddingPairsLsh(emb, "vec_id", "embedding", 0.45,
      planes = 3, tables = 8)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), "verify step must admit only true pairs")
    val recall = if (exact.isEmpty) 1.0 else lsh.size.toDouble / exact.size
    info(f"embeddingPairsLsh recall = $recall%.2f (${lsh.size}/${exact.size} pairs)")
    assert(recall >= 0.6, f"pair recall collapsed: $recall%.2f")
  }
}
