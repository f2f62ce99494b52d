package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EmbeddingDriftSpec extends SparkSpec {
  import spark.implicits._

  private def vec(i: Long): Seq[Float] = {
    val rnd = new scala.util.Random(i * 4241 + 7)
    Seq.fill(8)(rnd.nextFloat() * 2f - 1f)
  }

  // driver reference: quantize, per-dim sums, truncating-div centroid,
  // exact integer metrics — the operator's documented arithmetic
  private def centroid(vs: Seq[Seq[Float]]): Seq[Long] = {
    val n = vs.length.toLong
    (0 until vs.head.length).map { d =>
      vs.map(v => math.round(v(d).toDouble * 10000)).sum / n // Java /: trunc
    }
  }

  test("embeddingDrift == driver reference per slice") {
    val a = (0L until 40L).map(i => (i, vec(i), (i % 3).toInt))
      .toDF("vec_id", "embedding", "label")
    val b = (100L until 150L).map(i => (i, vec(i), (i % 3).toInt))
      .toDF("vec_id", "embedding", "label")
    val got = Profile.embeddingDrift(a, b, col("embedding"), Seq("label"))
      .as[(Int, Long, Long, Option[Long], Int, Long)]
      .collect().sortBy(_._1).toSeq
    val av = (0L until 40L).map(i => ((i % 3).toInt, vec(i)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val bv = (100L until 150L).map(i => ((i % 3).toInt, vec(i)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val expected = av.keySet.union(bv.keySet).toSeq.sorted.map { l =>
      val ma = centroid(av(l)); val mb = centroid(bv(l))
      val dot = ma.zip(mb).map { case (x, y) => x * y }.sum
      val na2 = ma.map(x => x * x).sum; val nb2 = mb.map(x => x * x).sum
      val dist2 = ma.zip(mb).map { case (x, y) => (x - y) * (x - y) }.sum
      val cos2 =
        if (na2 == 0 || nb2 == 0) None
        else Some((BigInt(dot) * dot * 1000000 / (BigInt(na2) * nb2)).toLong)
      (l, av(l).length.toLong, bv(l).length.toLong, cos2, dot.sign.toInt, dist2)
    }
    assert(got == expected && got.size == 3)
  }

  test("identical corpora read cos2_ppm = 1e6, dist2 = 0; one-sided slices survive with NULL metrics") {
    val a = Seq((1L, Seq(0.5f, -0.25f), "en"), (2L, Seq(0.1f, 0.9f), "en"),
      (3L, Seq(0.3f, 0.3f), "only_a")).toDF("vec_id", "embedding", "label")
    val b = Seq((9L, Seq(0.5f, -0.25f), "en"), (8L, Seq(0.1f, 0.9f), "en"),
      (7L, Seq(-0.2f, 0.4f), "only_b")).toDF("vec_id", "embedding", "label")
    val got = Profile.embeddingDrift(a, b, col("embedding"), Seq("label"))
      .collect().map(r => (r.getString(0),
        Option(r.get(1)), Option(r.get(2)),
        Option(r.get(3)), Option(r.get(4)), Option(r.get(5))))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      ("en", Some(2L), Some(2L), Some(1000000L), Some(1), Some(0L)),
      ("only_a", Some(1L), None, None, None, None),
      ("only_b", None, Some(1L), None, None, None)))
  }

  test("a zero-vector centroid reads NULL cosine but a real distance") {
    val a = Seq((1L, Seq(0f, 0f), "x")).toDF("vec_id", "embedding", "label")
    val b = Seq((2L, Seq(0.3f, -0.4f), "x")).toDF("vec_id", "embedding", "label")
    val r = Profile.embeddingDrift(a, b, col("embedding"), Seq("label"))
      .collect().head
    assert(r.isNullAt(3) && r.getInt(4) == 0 &&
      r.getLong(5) == 3000L * 3000 + 4000L * 4000)
  }

  test("global (no-slice) drift emits exactly one row") {
    val a = (0L until 10L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val b = (5L until 15L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val rows = Profile.embeddingDrift(a, b, col("embedding")).collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 10L &&
      rows.head.getLong(1) == 10L)
  }

  test("ragged vector lengths within a slice fail loud, never divide by the wrong n") {
    // two 2-dim + one 3-dim vector in one slice: dim 2's sum would be
    // divided by 3 under the old max(__n) arithmetic — now a raised error
    val a = Seq((1L, Seq(1f, 2f)), (2L, Seq(3f, 4f)), (3L, Seq(5f, 6f, 7f)))
      .toDF("vec_id", "embedding")
    val b = Seq((9L, Seq(1f, 1f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Profile.embeddingDrift(a, b, col("embedding")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("ragged vector lengths")))
  }

  test("a dim-count mismatch BETWEEN corpora reads NULL metrics, not wrong numbers") {
    val a = Seq((1L, Seq(1f, 2f))).toDF("vec_id", "embedding")
    val b = Seq((2L, Seq(1f, 2f, 3f))).toDF("vec_id", "embedding")
    val r = Profile.embeddingDrift(a, b, col("embedding")).collect().head
    // n_a, n_b real; cos2_ppm / cos_sign / dist2 all NULL (zip_with pads)
    assert(r.getLong(0) == 1L && r.getLong(1) == 1L &&
      r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
  }
}
