package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based differential tests for the round-8 analytics tail —
  * [[Analytics.percentileRank]] (with quantile buckets),
  * [[Analytics.robustStandardize]], and [[Profile.keySkew]] — against
  * independent driver-side references over randomized inputs (ties,
  * nulls, singleton groups, heavy skew), the [[CcPropertySpec]] /
  * PipelinePropertySpec convention.
  */
class AnalyticsPropertySpec extends SparkSpec {
  import spark.implicits._

  // rows: (row id, group, optional value) — small value range forces ties
  private val genRows: Gen[List[(Long, String, Option[Long])]] = for {
    n <- Gen.choose(1, 60)
    rows <- Gen.listOfN(n, for {
      g <- Gen.oneOf("a", "b", "c")
      v <- Gen.frequency(9 -> Gen.choose(-5L, 5L).map(Some(_)), 1 -> Gen.const(None))
    } yield (g, v))
  } yield rows.zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }

  test("percentileRank + buckets == driver-side strict-rank ECDF") {
    val k = 4
    val prop = Prop.forAll(genRows) { rows =>
      val df = rows.toDF("id", "g", "v")
      val got = Analytics.percentileRank(df, Seq("g"), col("v"), buckets = Some(k))
        .select("id", "pct_ppm", "bucket")
        .as[(Long, Option[Long], Option[Long])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val byGroup = rows.groupBy(_._2)
      val expected = rows.map { case (id, g, v) =>
        val vals = byGroup(g).flatMap(_._3)
        id -> (v match {
          case None => (None, None)
          case Some(x) =>
            val n = vals.size.toLong
            val ppm = if (n < 2) 0L
              else vals.count(_ < x).toLong * 1000000L / (n - 1)
            (Some(ppm), Some(math.min(ppm * k / 1000000L, k - 1L)))
        })
      }.toMap
      got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  // Spark's exact interpolated percentile at p over a sorted sample
  private def pctl(sorted: Vector[Double], p: Double): Double = {
    val pos = (sorted.size - 1) * p
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    sorted(lo) + (sorted(hi) - sorted(lo)) * (pos - lo)
  }

  test("robustStandardize == driver-side median/MAD z over integer inputs") {
    val prop = Prop.forAll(genRows) { rows =>
      val df = rows.toDF("id", "g", "v")
      val got = Analytics.robustStandardize(df, Seq("g"), col("v"))
        .select("id", "robust_z")
        .as[(Long, Option[Double])].collect().toMap
      val byGroup = rows.groupBy(_._2)
      val expected = rows.map { case (id, g, v) =>
        id -> (v match {
          case None => None
          case Some(x) =>
            val vals = byGroup(g).flatMap(_._3).map(_.toDouble).sorted.toVector
            val med = pctl(vals, 0.5)
            val mad = pctl(vals.map(d => math.abs(d - med)).sorted, 0.5)
            Some(if (mad == 0.0) 0.0 else (x - med) / mad)
        })
      }.toMap
      got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  // heavy-skew key stream: a few hot keys + a long tail
  private val genKeys: Gen[List[String]] = for {
    n <- Gen.choose(1, 120)
    keys <- Gen.listOfN(n, Gen.frequency(
      5 -> Gen.const("hot1"), 3 -> Gen.const("hot2"),
      2 -> Gen.oneOf((1 to 30).map(i => s"k$i"))))
  } yield keys

  test("keySkew == driver-side top-k count profile with ppm shares") {
    val k = 5
    val prop = Prop.forAll(genKeys) { keys =>
      val df = keys.toDF("key")
      val got = Profile.keySkew(df, Seq("key"), k)
        .select("key", "cnt", "rank", "n_keys", "ppm")
        .as[(String, Long, Long, Long, Long)].collect().toSet
      val counts = keys.groupBy(identity).map { case (key, ks) => key -> ks.size.toLong }
      val tot = keys.size.toLong
      val expected = counts.toSeq
        .sortBy { case (key, c) => (-c, key) }.take(k).zipWithIndex
        .map { case ((key, c), i) =>
          (key, c, i + 1L, counts.size.toLong, c * 1000000L / tot)
        }.toSet
      got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }
}
