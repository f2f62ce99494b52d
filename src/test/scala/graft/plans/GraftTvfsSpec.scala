package graft.plans

import graft.SparkSpec
import graft.operators.{Dedup, Profile, TextStats}
import org.apache.spark.sql.functions._

class GraftTvfsSpec extends SparkSpec {
  import spark.implicits._

  private def registered() = graft.functions.GraftFunctions.register(spark)

  test("graft_drift == categoricalDrift of the same tables") {
    registered()
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"), (5L, "c"))
      .toDF("id", "cat")
    docs.filter($"id" % 2 === 0).createOrReplaceTempView("gt_a")
    docs.filter($"id" % 2 =!= 0).createOrReplaceTempView("gt_b")
    val viaTvf = spark.sql("SELECT * FROM graft_drift('gt_a', 'gt_b', 'cat')")
      .collect().toSet
    val viaApi = Profile.categoricalDrift(
      docs.filter($"id" % 2 === 0), docs.filter($"id" % 2 =!= 0), col("cat"))
      .collect().toSet
    assert(viaTvf == viaApi && viaTvf.nonEmpty)
  }

  test("graft_dedup_pairs simhash/minhash == the API twins; unknown method loud") {
    registered()
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different content with nothing shared at all here"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("gt_docs")
    val simTvf = spark.sql(
      "SELECT * FROM graft_dedup_pairs('gt_docs', 'doc_id', 'text', 'simhash', 3)")
      .collect().toSet
    assert(simTvf == Dedup.simhashPairs(docs, "doc_id", "text", 3).collect().toSet)
    assert(simTvf.nonEmpty) // the identical pair is found
    val mhTvf = spark.sql(
      "SELECT * FROM graft_dedup_pairs('gt_docs', 'doc_id', 'text', 'minhash', 70)")
      .collect().toSet
    assert(mhTvf ==
      Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.7).collect().toSet)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_dedup_pairs('gt_docs', 'doc_id', 'text', 'tractor')")
        .collect()
    }
    assert(e.getMessage.contains("unknown method") ||
      Option(e.getCause).exists(_.getMessage.contains("unknown method")))
  }

  test("graft_quality == qualityRuleSignals at default thresholds, composes in outer SQL") {
    registered()
    val docs = Seq(
      (1L, Seq.fill(60)("the good and solid word").mkString(" ")),
      (2L, "tiny"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("gt_q")
    val viaTvf = spark.sql(
      "SELECT * FROM graft_quality('gt_q', 'doc_id', 'text')").collect().toSet
    val viaApi = TextStats.qualityRuleSignals(docs, "doc_id", "text")
      .collect().toSet
    assert(viaTvf == viaApi)
    // TVF output composes like any table: filter in the outer query
    val kept = spark.sql(
      "SELECT doc_id FROM graft_quality('gt_q', 'doc_id', 'text') WHERE keep = 1")
      .as[Long].collect().toSeq
    assert(kept == Seq(1L))
  }

  test("graft_overlap / graft_distinct == the KMV API twins; default k applies") {
    registered()
    val a = (1 to 500).map(i => (i.toLong, s"key$i")).toDF("id", "k")
    val b = (301 to 800).map(i => (i.toLong, s"key$i")).toDF("id", "k")
    a.createOrReplaceTempView("gt_ov_a")
    b.createOrReplaceTempView("gt_ov_b")
    val viaTvf = spark.sql(
      "SELECT * FROM graft_overlap('gt_ov_a', 'gt_ov_b', 'k', 128)")
      .collect().toSeq
    val viaApi = Profile.kmvOverlap(
      Profile.kmvSketch(a, col("k"), 128),
      Profile.kmvSketch(b, col("k"), 128), 128).collect().toSeq
    assert(viaTvf == viaApi)
    // default k = 1024 > universe → exact branch everywhere
    val exact = spark.sql(
      "SELECT * FROM graft_overlap('gt_ov_a', 'gt_ov_b', 'k')").collect().head
    assert(exact.getAs[Long]("est_union") == 800L)
    assert(exact.getAs[Long]("est_intersection") == 200L)

    val docs = (1 to 300).map(i => (s"key${i % 90}", s"s${i % 3}")).toDF("k", "slice")
    docs.createOrReplaceTempView("gt_dv")
    val dTvf = spark.sql(
      "SELECT * FROM graft_distinct('gt_dv', 'k', 'slice', 16)")
      .collect().toSet
    val dApi = Profile.kmvDistinct(
      Profile.kmvSketch(docs, col("k"), 16, Seq("slice")), 16, Seq("slice"))
      .collect().toSet
    assert(dTvf == dApi)
  }

  test("graft_woverlap == kmvWeightedJaccard API twin; exact at default k") {
    registered()
    val a = (1 to 100).map(i => (s"key$i", 10L)).toDF("k", "w")
    val b = (51 to 150).map(i => (s"key$i", 10L)).toDF("k", "w")
    a.createOrReplaceTempView("gt_wj_a")
    b.createOrReplaceTempView("gt_wj_b")
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val viaTvf = spark.sql(
      "SELECT * FROM graft_woverlap('gt_wj_a', 'gt_wj_b', 'k', 'w', 64)")
      .collect().toSeq
    val viaApi = Profile.kmvWeightedJaccard(
      Profile.kmvSketchWeighted(a, col("k"), col("w"), 64),
      Profile.kmvSketchWeighted(b, col("k"), col("w"), 64), 64)
      .collect().toSeq
    assert(viaTvf == viaApi)
    // default k = 1024 > universe → exact weighted Jaccard: 500/1500
    val exact = spark.sql(
      "SELECT * FROM graft_woverlap('gt_wj_a', 'gt_wj_b', 'k', 'w')")
      .collect().head
    assert(exact.getAs[Long]("wjaccard_ppm") == 333333L)
    assert(exact.getAs[Long]("est_w_max") == 1500L)
    // repeated TVF calls leave nothing NEW persisted (the r15 leak
    // class; earlier suites' blocks are not this test's concern)
    assert(spark.sparkContext.getPersistentRDDs.keySet == persistedBefore)
  }

  test("graft_knn_label == labelPropagate API twin; default k applies") {
    registered()
    def vec(i: Long): Seq[Float] = {
      val rnd = new scala.util.Random(i * 3571 + 17)
      Seq.fill(8)(rnd.nextFloat() * 2f - 1f)
    }
    val emb = (0L until 60L).map(i => (i, vec(i), (i % 3).toInt))
      .toDF("vec_id", "embedding", "label")
    emb.filter($"vec_id" % 20 === 0).createOrReplaceTempView("gt_knn_q")
    emb.filter($"vec_id" % 20 =!= 0).createOrReplaceTempView("gt_knn_s")
    val viaTvf = spark.sql(
      "SELECT * FROM graft_knn_label('gt_knn_q', 'gt_knn_s', 'vec_id', " +
        "'embedding', 'label', 7)").collect().toSeq.sortBy(_.getLong(0))
    val viaApi = graft.operators.Similarity.labelPropagate(
      emb.filter($"vec_id" % 20 === 0), emb.filter($"vec_id" % 20 =!= 0),
      "vec_id", "embedding", "label", 7)
      .collect().toSeq.sortBy(_.getLong(0))
    assert(viaTvf == viaApi && viaTvf.nonEmpty)
    // default k = 5
    val dflt = spark.sql(
      "SELECT * FROM graft_knn_label('gt_knn_q', 'gt_knn_s', 'vec_id', " +
        "'embedding', 'label')").collect().toSeq.sortBy(_.getLong(0))
    val dfltApi = graft.operators.Similarity.labelPropagate(
      emb.filter($"vec_id" % 20 === 0), emb.filter($"vec_id" % 20 =!= 0),
      "vec_id", "embedding", "label", 5)
      .collect().toSeq.sortBy(_.getLong(0))
    assert(dflt == dfltApi)
  }

  test("graft_quantiles == groupQuantiles API twin; bad mode loud") {
    registered()
    val df = (1 to 100).map(i => (i.toLong, s"g${i % 2}"))
      .toDF("v", "g")
    df.createOrReplaceTempView("gt_qtl_v")
    val viaTvf = spark.sql(
      "SELECT * FROM graft_quantiles('gt_qtl_v', 'v', 'g', 'exact')")
      .collect().toSeq.sortBy(_.getString(0))
    val viaApi = Profile.groupQuantiles(df, Seq("g"), "v",
      probs = Seq(0.25, 0.5, 0.75), exact = true)
      .collect().toSeq.sortBy(_.getString(0))
    assert(viaTvf == viaApi && viaTvf.size == 2)
    val e = intercept[Exception](spark.sql(
      "SELECT * FROM graft_quantiles('gt_qtl_v', 'v', 'g', 'median')")
      .collect())
    assert(e.getMessage.contains("unknown mode"))
  }

  test("graft_asof / graft_sessionize == the API twins; bad direction loud") {
    registered()
    def ts(m: Int) = new java.sql.Timestamp(m * 60000L)
    val left = Seq((1L, ts(10), "p1"), (1L, ts(100), "p2"), (2L, ts(50), "p3"))
      .toDF("user_id", "ts", "tag")
    val right = Seq((1L, ts(5), "c1"), (1L, ts(60), "c2"), (2L, ts(70), "c3"))
      .toDF("user_id", "ts", "tag")
    left.createOrReplaceTempView("gt_asof_l")
    right.createOrReplaceTempView("gt_asof_r")
    val viaTvf = spark.sql(
      "SELECT * FROM graft_asof('gt_asof_l', 'gt_asof_r', 'user_id', 'ts', 'ts')")
      .collect().map(_.toSeq).toSet
    val viaApi = graft.operators.Joins.asOf(left, right, Seq("user_id"),
      "ts", "ts").collect().map(_.toSeq).toSet
    assert(viaTvf == viaApi && viaTvf.nonEmpty)
    val fwd = spark.sql("SELECT * FROM graft_asof('gt_asof_l', 'gt_asof_r', " +
      "'user_id', 'ts', 'ts', 'forward')").collect().map(_.toSeq).toSet
    val fwdApi = graft.operators.Joins.asOf(left, right, Seq("user_id"),
      "ts", "ts", direction = "forward").collect().map(_.toSeq).toSet
    assert(fwd == fwdApi && fwd != viaTvf)
    val e = intercept[Exception](spark.sql(
      "SELECT * FROM graft_asof('gt_asof_l', 'gt_asof_r', 'user_id', " +
        "'ts', 'ts', 'sideways')").collect())
    assert(e.getMessage.contains("backward|forward|nearest"))

    val ev = Seq((1L, ts(0), 7L, "view", 0.0), (2L, ts(10), 7L, "view", 0.0),
      (3L, ts(90), 7L, "view", 0.0), (4L, ts(5), 8L, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    ev.createOrReplaceTempView("gt_sess_v")
    val sessTvf = spark.sql(
      "SELECT * FROM graft_sessionize('gt_sess_v', 30)")
      .collect().map(_.toSeq).toSet
    val sessApi = graft.streaming.EventStreams.sessionizeBatch(ev, 30)
      .collect().map(_.toSeq).toSet
    assert(sessTvf == sessApi && sessTvf.size == 3)
  }

  test("graft_drift_embed == embeddingDrift API twin") {
    registered()
    def vec(i: Long): Seq[Float] = {
      val rnd = new scala.util.Random(i * 911 + 5)
      Seq.fill(8)(rnd.nextFloat() * 2f - 1f)
    }
    val a = (0L until 30L).map(i => (i, vec(i), (i % 2).toInt))
      .toDF("vec_id", "embedding", "label")
    val b = (50L until 90L).map(i => (i, vec(i), (i % 2).toInt))
      .toDF("vec_id", "embedding", "label")
    a.createOrReplaceTempView("gt_de_a"); b.createOrReplaceTempView("gt_de_b")
    val viaTvf = spark.sql("SELECT * FROM graft_drift_embed('gt_de_a', " +
      "'gt_de_b', 'embedding', 'label')").collect().map(_.toSeq).toSet
    val viaApi = Profile.embeddingDrift(a, b, col("embedding"), Seq("label"))
      .collect().map(_.toSeq).toSet
    assert(viaTvf == viaApi && viaTvf.size == 2)
  }

  test("argument validation fails loud") {
    registered()
    Seq((1L, "x")).toDF("doc_id", "text").createOrReplaceTempView("gt_v")
    intercept[Exception] {
      spark.sql("SELECT * FROM graft_drift('gt_v', 'gt_v')").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT * FROM graft_dedup_pairs('gt_v', 'doc_id', 'text', 'minhash', 0)")
        .collect()
    }
    intercept[Exception] { // non-literal argument
      spark.sql("SELECT * FROM graft_quality('gt_v', 'doc_id', lower('text'))")
        .collect()
    }
  }
}
