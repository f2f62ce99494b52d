package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based differential test for the binned range joins: random
  * points/intervals (negative values, zero-length intervals, bin-boundary
  * landings) against the naive inequality join, across bin widths.
  */
class JoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private val genVal: Gen[Double] =
    Gen.oneOf(Gen.choose(-100.0, 100.0), Gen.choose(-3, 3).map(_ * 7.0))

  private val genPoints: Gen[List[Double]] = Gen.listOfN(12, genVal)
  private val genIntervals: Gen[List[(Double, Double)]] =
    Gen.listOfN(8, for {
      a <- genVal
      len <- Gen.oneOf(0.0, 0.5, 7.0, 40.0)
    } yield (a, a + len))

  test("rangeJoin == naive inequality join for random data and bin widths") {
    val prop = Prop.forAll(genPoints, genIntervals, Gen.oneOf(0.7, 7.0, 31.0)) {
      (ps, is, w) =>
        val points = ps.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("pid", "x")
        val intervals = is.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
          .toDF("iid", "lo", "hi")
        val naive = points.join(intervals,
            points("x") >= intervals("lo") && points("x") <= intervals("hi"))
          .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
        val binned = Joins.rangeJoin(points, intervals, "x", "lo", "hi", w)
          .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
        binned == naive
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("TopNRows == window row_number formulation for random groups/ties/n") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val genRows: Gen[List[(Int, Int, Int)]] = Gen.listOfN(40, for {
      k <- Gen.choose(0, 3)
      v <- Gen.choose(-5, 5) // narrow range forces ties
      tb <- Gen.choose(0, 100)
    } yield (k, v, tb))
    val prop = Prop.forAll(genRows, Gen.choose(1, 6), Gen.oneOf(false, true)) {
      (rows, n, isMax) =>
        val df = rows.toDF("k", "v", "tb").repartition(5)
        val ord = if (isMax) Seq(col("v").desc, col("tb").desc) else Seq(col("v"), col("tb"))
        val w = Window.partitionBy("k").orderBy(ord: _*)
        val expected = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= n)
          .select("k", "v", "tb").as[(Int, Int, Int)].collect().sorted.toSeq
        val got = df.groupBy("k")
          .agg(graft.functions.TopN.rows(
            struct(col("v"), col("tb")), struct(col("v"), col("tb")), n, isMax).as("t"))
          .select(col("k"), explode(col("t")).as("r"))
          .select(col("k"), col("r.v"), col("r.tb")).as[(Int, Int, Int)]
          .collect().sorted.toSeq
        got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("intervalOverlapJoin == naive overlap join for random data and bin widths") {
    val prop = Prop.forAll(genIntervals, genIntervals, Gen.oneOf(0.7, 7.0, 31.0)) {
      (as, bs, w) =>
        val a = as.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
          .toDF("aid", "alo", "ahi")
        val b = bs.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
          .toDF("bid", "blo", "bhi")
        val naive = a.join(b, a("alo") <= b("bhi") && b("blo") <= a("ahi"))
          .select("aid", "bid").as[(Long, Long)].collect().sorted.toSeq
        val binned = Joins.intervalOverlapJoin(a, b, "alo", "ahi", "blo", "bhi", w)
          .select("aid", "bid").as[(Long, Long)].collect().sorted.toSeq
        binned == naive
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }
}
