package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the KMV sketch contract: bounded DISTINCT bottom-k under any
  * partitioning, exact sketch-merge algebra, the estimator's two branches,
  * and overlap estimates against ground truth on constructed sets.
  */
class KmvSketchSpec extends SparkSpec {

  import spark.implicits._

  test("BottomKDistinct dedups inside the buffer: duplicates never evict members") {
    // 1000 copies of the SMALLEST value plus 5 distinct others; a plain
    // value heap of k=4 would fill with copies of 0 and lose 1..3
    val df = (Seq.fill(1000)(0L) ++ Seq(40L, 10L, 30L, 20L, 50L))
      .toDF("v").repartition(7)
    val got = df.agg(graft.functions.BottomK.distinct(col("v"), 4).as("bk"))
      .select(explode(col("bk")).as("h")).as[Long].collect().toSeq
    assert(got == Seq(0L, 10L, 20L, 30L))
  }

  test("bounded output, ascending order, null skip, fewer-than-k passthrough") {
    val df = Seq(Some(3L), None, Some(1L), Some(3L), Some(2L)).toDF("v")
    val got = df.agg(graft.functions.BottomK.distinct(col("v"), 10).as("bk"))
      .select(explode(col("bk")).as("h")).as[Long].collect().toSeq
    assert(got == Seq(1L, 2L, 3L))
  }

  test("kmvSketch is partitioning-invariant and matches the sort-limit definition") {
    val docs = (1 to 500).map(i => (s"key$i", s"s${i % 3}")).toDF("k", "slice")
    val a = Profile.kmvSketch(docs.repartition(13), col("k"), 16, Seq("slice"))
      .orderBy("slice", "h").collect().toSeq
    val b = Profile.kmvSketch(docs.coalesce(1), col("k"), 16, Seq("slice"))
      .orderBy("slice", "h").collect().toSeq
    assert(a == b)
    // definitional check on one slice: distinct hashes sorted, first 16
    val wantS0 = docs.filter(col("slice") === "s0")
      .select(graft.functions.Md5Hash60.column(col("k")).as("h"))
      .distinct().orderBy("h").limit(16).as[Long].collect().toSeq
    val gotS0 = a.filter(_.getString(0) == "s0").map(_.getLong(1)).toSeq
    assert(gotS0 == wantS0)
  }

  test("kmvMerge of slice sketches equals the sketch of the union") {
    val docs = (1 to 800).map(i => (s"key$i", s"s${i % 4}")).toDF("k", "slice")
    val sliced = Profile.kmvSketch(docs, col("k"), 32, Seq("slice"))
    val merged = Profile.kmvMerge(sliced, 32).orderBy("h").as[Long].collect().toSeq
    val direct = Profile.kmvSketch(docs, col("k"), 32)
      .orderBy("h").as[Long].collect().toSeq
    assert(merged == direct)
  }

  test("kmvDistinct: exact below k, estimator within 3/sqrt(k-2) above") {
    val n = 20000
    val docs = (1 to n).map(i => s"item$i").toDF("k")
    val k = 1024
    val sk = Profile.kmvSketch(docs, col("k"), k)
    val est = Profile.kmvDistinct(sk, k).collect().head
    assert(est.getLong(0) == k) // n_kept
    val rel = math.abs(est.getLong(1).toDouble - n) / n
    assert(rel < 3.0 / math.sqrt(k - 2), s"est=${est.getLong(1)} rel=$rel")
    // exact branch
    val small = (1 to 50).map(i => s"item$i").toDF("k")
    val exact = Profile.kmvDistinct(Profile.kmvSketch(small, col("k"), k), k)
      .collect().head
    assert(exact.getLong(0) == 50 && exact.getLong(1) == 50)
  }

  test("kmvOverlap recovers a constructed Jaccard within sketch error") {
    // A = 1..12000, B = 8001..20000 → |A∩B| = 4000, |A∪B| = 20000, J = 0.2
    val a = (1 to 12000).map(i => s"key$i").toDF("k")
    val b = (8001 to 20000).map(i => s"key$i").toDF("k")
    val k = 1024
    val row = Profile.kmvOverlap(
      Profile.kmvSketch(a, col("k"), k),
      Profile.kmvSketch(b, col("k"), k), k).collect().head
    val jac = row.getAs[Long]("jaccard_ppm").toDouble / 1e6
    assert(math.abs(jac - 0.2) < 0.05, s"jaccard=$jac")
    val eu = row.getAs[Long]("est_union").toDouble
    assert(math.abs(eu - 20000) / 20000 < 0.15, s"est_union=$eu")
    val ei = row.getAs[Long]("est_intersection").toDouble
    assert(math.abs(ei - 4000) / 4000 < 0.3, s"est_intersection=$ei")
  }

  test("disjoint corpora estimate zero intersection; identical corpora estimate J=1") {
    val a = (1 to 3000).map(i => s"left$i").toDF("k")
    val b = (1 to 3000).map(i => s"right$i").toDF("k")
    val k = 256
    val sa = Profile.kmvSketch(a, col("k"), k)
    val sb = Profile.kmvSketch(b, col("k"), k)
    val disjoint = Profile.kmvOverlap(sa, sb, k).collect().head
    assert(disjoint.getAs[Long]("matches") == 0L)
    assert(disjoint.getAs[Long]("est_intersection") == 0L)
    val same = Profile.kmvOverlap(sa, sa, k).collect().head
    assert(same.getAs[Long]("jaccard_ppm") == 1000000L)
  }

  test("kmvOverlapMatrix agrees with pairwise kmvOverlap on every pair") {
    // three slices with engineered overlaps: A∩B = 1000, A∩C = 0, B∩C = 500
    val rows =
      (1 to 3000).map(i => (s"key$i", "A")) ++
      (2001 to 5000).map(i => (s"key$i", "B")) ++
      (4501 to 7000).map(i => (s"key$i", "C"))
    val df = rows.toDF("k", "slice")
    val k = 256
    val sk = Profile.kmvSketch(df, col("k"), k, Seq("slice"))
    val matrix = Profile.kmvOverlapMatrix(sk, "slice", k)
      .orderBy("slice_a", "slice_b").collect()
    assert(matrix.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("A", "B"), ("A", "C"), ("B", "C")))
    for (row <- matrix) {
      val sa = sk.filter(col("slice") === row.getString(0)).select("h")
      val sb = sk.filter(col("slice") === row.getString(1)).select("h")
      val single = Profile.kmvOverlap(sa, sb, k).collect().head
      assert(row.toSeq.drop(2) == single.toSeq,
        s"${row.getString(0)}-${row.getString(1)}: matrix ${row.toSeq.drop(2)} vs pairwise ${single.toSeq}")
    }
    // the disjoint pair really reads as disjoint
    val ac = matrix.find(r => r.getString(0) == "A" && r.getString(1) == "C").get
    assert(ac.getAs[Long]("matches") == 0L)
  }

  test("kmvDifference recovers constructed directional differences") {
    // A = 1..12000, B = 8001..20000 → |A∖B| = 8000, |B∖A| = 8000,
    // |A∪B| = 20000 (deliberately the kmvOverlap fixture so the union
    // estimates must agree between the two operators)
    val a = (1 to 12000).map(i => s"key$i").toDF("k")
    val b = (8001 to 20000).map(i => s"key$i").toDF("k")
    val k = 1024
    val sa = Profile.kmvSketch(a, col("k"), k)
    val sb = Profile.kmvSketch(b, col("k"), k)
    val row = Profile.kmvDifference(sa, sb, k).collect().head
    assert(row.getAs[Long]("union_k") == k)
    // partition identity on the combined bottom-k itself is exact
    assert(row.getAs[Long]("matches") + row.getAs[Long]("only_a") +
      row.getAs[Long]("only_b") == row.getAs[Long]("union_k"))
    val eab = row.getAs[Long]("est_a_minus_b").toDouble
    val eba = row.getAs[Long]("est_b_minus_a").toDouble
    assert(math.abs(eab - 8000) / 8000 < 0.25, s"est_a_minus_b=$eab")
    assert(math.abs(eba - 8000) / 8000 < 0.25, s"est_b_minus_a=$eba")
    // union estimate agrees with kmvOverlap's (same definition)
    val ov = Profile.kmvOverlap(sa, sb, k).collect().head
    assert(row.getAs[Long]("est_union") == ov.getAs[Long]("est_union"))
    assert(row.getAs[Long]("matches") == ov.getAs[Long]("matches"))
    // subset: A ∖ A = 0 on both axes
    val self = Profile.kmvDifference(sa, sa, k).collect().head
    assert(self.getAs[Long]("only_a") == 0L &&
      self.getAs[Long]("est_a_minus_b") == 0L &&
      self.getAs[Long]("est_b_minus_a") == 0L)
  }

  test("kmvWeightedJaccard: exact below k, estimator within sketch error at k, zero-mass guard") {
    // exact branch: A = keys 1..100 @ weight 10, B = keys 51..150 @ 10,
    // except key60 where the sides disagree (A: 4, B: 10 → min 4, max 10)
    val a = (1 to 100).map(i => (s"key$i", if (i == 60) 4L else 10L))
      .toDF("k", "w")
    val b = (51 to 150).map(i => (s"key$i", 10L)).toDF("k", "w")
    val k = 1024
    val wj = Profile.kmvWeightedJaccard(
      Profile.kmvSketchWeighted(a, col("k"), col("w"), k),
      Profile.kmvSketchWeighted(b, col("k"), col("w"), k), k)
      .collect().head
    assert(wj.getAs[Long]("union_k") == 150L)
    assert(wj.getAs[Long]("matches") == 50L)
    // Σmin = 49·10 + 4 = 494 (union-only keys contribute 0)
    assert(wj.getAs[Long]("w_min_sum") == 494L)
    // Σmax = 150·10 = 1500 (key60's max is B's 10)
    assert(wj.getAs[Long]("w_max_sum") == 1500L)
    assert(wj.getAs[Long]("wjaccard_ppm") == 494L * 1000000 / 1500)
    // exact branch: est masses are the sampled masses themselves
    assert(wj.getAs[Long]("est_union") == 150L)
    assert(wj.getAs[Long]("est_w_min") == 494L)
    assert(wj.getAs[Long]("est_w_max") == 1500L)

    // estimator branch: 20000-key union at k=64 — the ppm ratio must
    // land within the combined-sample band of the true 1/3
    val bigA = (1 to 12000).map(i => (s"key$i", 5L)).toDF("k", "w")
    val bigB = (8001 to 20000).map(i => (s"key$i", 5L)).toDF("k", "w")
    val k2 = 64
    val est = Profile.kmvWeightedJaccard(
      Profile.kmvSketchWeighted(bigA, col("k"), col("w"), k2),
      Profile.kmvSketchWeighted(bigB, col("k"), col("w"), k2), k2)
      .collect().head
    // true J_w = 4000·5 / 20000·5 = 0.2; at k=64 the sampling error is
    // ~1/sqrt(62) ≈ 13% of the union — allow a generous absolute band
    val ppm = est.getAs[Long]("wjaccard_ppm").toDouble / 1e6
    assert(math.abs(ppm - 0.2) < 0.15, s"wjaccard=$ppm")
    val eu = est.getAs[Long]("est_union").toDouble
    assert(math.abs(eu - 20000) / 20000 < 0.5, s"est_union=$eu")

    // all-zero weights carry no mass: ppm defined as 0, never a crash
    val za = Seq(("x", 0L), ("y", 0L)).toDF("k", "w")
    val zj = Profile.kmvWeightedJaccard(
      Profile.kmvSketchWeighted(za, col("k"), col("w"), 16),
      Profile.kmvSketchWeighted(za, col("k"), col("w"), 16), 16)
      .collect().head
    assert(zj.getAs[Long]("wjaccard_ppm") == 0L)
    assert(zj.getAs[Long]("w_max_sum") == 0L)
  }

  test("KMV set operations leave nothing persisted (graft_overlap/graft_difference TVF-loop safety)") {
    // the r15 localCheckpoint implementation leaked one RDD block pair
    // per call — a session invoking the TVFs per query accumulated them
    // for the JVM's life. The driver-local rewrite must leave the
    // persistent-RDD registry exactly as it found it.
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    val a = (1 to 3000).map(i => s"key$i").toDF("k")
    val b = (2001 to 5000).map(i => s"key$i").toDF("k")
    val k = 256
    val sa = Profile.kmvSketch(a, col("k"), k)
    val sb = Profile.kmvSketch(b, col("k"), k)
    val wa = Profile.kmvSketchWeighted(a, col("k"), lit(7L), k)
    val wb = Profile.kmvSketchWeighted(b, col("k"), lit(7L), k)
    Profile.kmvOverlap(sa, sb, k).collect()
    Profile.kmvDifference(sa, sb, k).collect()
    Profile.kmvSetWeights(wa, wb, k).collect()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"leaked: ${spark.sparkContext.getPersistentRDDs.keys.toSeq.sorted}")
    // a non-sketch table posing as a sketch fails LOUD, never truncates
    val fake = (1 to 400).map(i => (i.toLong, 1L)).toDF("h", "w")
    intercept[IllegalArgumentException] {
      Profile.kmvOverlap(fake.select("h"), sb, k)
    }
  }

  test("weighted sketch: hash set equals the unweighted sketch; max weight per hash; null weight reads 0") {
    val rows = (1 to 400).map(i => (s"key$i", Some(i.toLong))) ++
      Seq(("key7", Some(999L)),           // duplicate key, bigger weight → max wins
          ("keyNullW", None: Option[Long])) // weight NULL → 0
    val df = rows.toDF("k", "w").repartition(9)
    val k = 32
    val wsk = Profile.kmvSketchWeighted(df, col("k"), col("w"), k)
      .orderBy("h").collect()
    val plain = Profile.kmvSketch(df, col("k"), k)
      .orderBy("h").as[Long].collect().toSeq
    assert(wsk.map(_.getLong(0)).toSeq == plain) // identical membership
    // weights are max per key: recompute expected from the key set
    val hOf = df.select(col("k"),
        graft.functions.Md5Hash60.column(col("k")).as("h"))
      .distinct().collect().map(r => r.getLong(1) -> r.getString(0)).toMap
    wsk.foreach { r =>
      val key = hOf(r.getLong(0))
      val want =
        if (key == "key7") 999L
        else if (key == "keyNullW") 0L
        else key.stripPrefix("key").toLong
      assert(r.getLong(1) == want, s"$key: got ${r.getLong(1)}, want $want")
    }
  }

  test("kmvWeightedSum: exact below k; scale-up estimate within sketch error at k") {
    // exact branch: 40 keys, weight = 10·i → total 8200
    val small = (1 to 40).map(i => (s"key$i", 10L * i)).toDF("k", "w")
    val k = 64
    val exact = Profile.kmvWeightedSum(
      Profile.kmvSketchWeighted(small, col("k"), col("w"), k), k)
      .collect().head
    assert(exact.getAs[Long]("n_kept") == 40L)
    assert(exact.getAs[Long]("est_distinct") == 40L)
    assert(exact.getAs[Long]("est_total_w") == (1 to 40).map(10L * _).sum)
    // estimator branch: 20000 keys of constant weight 7 → total 140000
    val big = (1 to 20000).map(i => (s"item$i", 7L)).toDF("k", "w")
    val kk = 1024
    val est = Profile.kmvWeightedSum(
      Profile.kmvSketchWeighted(big, col("k"), col("w"), kk), kk)
      .collect().head
    val tot = est.getAs[Long]("est_total_w").toDouble
    assert(math.abs(tot - 140000) / 140000 < 3.0 / math.sqrt(kk - 2),
      s"est_total_w=$tot")
    // constant weight: est_total_w == est_distinct · 7 exactly
    assert(est.getAs[Long]("est_total_w") ==
      est.getAs[Long]("est_distinct") * 7L)
  }

  test("weighted sketch is partitioning-invariant") {
    val df = (1 to 600).map(i => (s"key$i", (i % 13).toLong)).toDF("k", "w")
    val a = Profile.kmvSketchWeighted(df.repartition(17), col("k"), col("w"), 24)
      .orderBy("h").collect().toSeq
    val b = Profile.kmvSketchWeighted(df.coalesce(1), col("k"), col("w"), 24)
      .orderBy("h").collect().toSeq
    assert(a == b)
  }

  test("kmvSetWeights: exact below k; weighted regions recovered within sketch error at k") {
    // exact branch: A = 1..60 (w=10i), B = 41..100 (w=10i) → all sets
    // below k=256, so every count AND weight estimate is exact
    val a = (1 to 60).map(i => (s"key$i", 10L * i)).toDF("k", "w")
    val b = (41 to 100).map(i => (s"key$i", 10L * i)).toDF("k", "w")
    val k = 256
    val sa = Profile.kmvSketchWeighted(a, col("k"), col("w"), k)
    val sb = Profile.kmvSketchWeighted(b, col("k"), col("w"), k)
    val row = Profile.kmvSetWeights(sa, sb, k).collect().head
    assert(row.getAs[Long]("union_k") == 100L)
    assert(row.getAs[Long]("matches") == 20L)
    assert(row.getAs[Long]("only_a") == 40L && row.getAs[Long]("only_b") == 40L)
    assert(row.getAs[Long]("w_matched") == (41 to 60).map(10L * _).sum)
    assert(row.getAs[Long]("w_only_a") == (1 to 40).map(10L * _).sum)
    assert(row.getAs[Long]("w_only_b") == (61 to 100).map(10L * _).sum)
    // exact branch: est_union = union_k → scale-up is the identity
    assert(row.getAs[Long]("est_union") == 100L)
    assert(row.getAs[Long]("est_w_intersection") == row.getAs[Long]("w_matched"))
    assert(row.getAs[Long]("est_w_a_minus_b") == row.getAs[Long]("w_only_a"))
    assert(row.getAs[Long]("est_w_b_minus_a") == row.getAs[Long]("w_only_b"))
    // counts agree with the unweighted kmvDifference on the same sets
    val diff = Profile.kmvDifference(sa.select("h"), sb.select("h"), k)
      .collect().head
    assert(diff.getAs[Long]("matches") == 20L &&
      diff.getAs[Long]("only_a") == 40L && diff.getAs[Long]("only_b") == 40L)

    // estimator branch: A = 1..12000, B = 8001..20000, constant w=3 →
    // true weights: ∩ = 12000, A∖B = 24000, B∖A = 24000
    val bigA = (1 to 12000).map(i => (s"key$i", 3L)).toDF("k", "w")
    val bigB = (8001 to 20000).map(i => (s"key$i", 3L)).toDF("k", "w")
    val kk = 1024
    val est = Profile.kmvSetWeights(
      Profile.kmvSketchWeighted(bigA, col("k"), col("w"), kk),
      Profile.kmvSketchWeighted(bigB, col("k"), col("w"), kk), kk)
      .collect().head
    def rel(got: Long, want: Double) = math.abs(got - want) / want
    assert(rel(est.getAs[Long]("est_w_intersection"), 12000) < 0.3)
    assert(rel(est.getAs[Long]("est_w_a_minus_b"), 24000) < 0.25)
    assert(rel(est.getAs[Long]("est_w_b_minus_a"), 24000) < 0.25)
  }

  test("plan: sketch build is a bounded ObjectHashAggregate, no distinct exchange") {
    val docs = (1 to 100).map(i => s"key$i").toDF("k")
    val plan = Profile.kmvSketch(docs, col("k"), 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("bottom_k_distinct"), plan)
  }
}
