package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based check of the KMV sketch ALGEBRA against an independent
  * Scala-collections model: for arbitrary key multisets and arbitrary
  * 2-way splits, (1) the distributed sketch equals sorted-distinct-take-k
  * of the model hashes, and (2) merging the two split sketches equals the
  * whole-set sketch — the exactness claim every streamed/compacted
  * serving path rests on.
  */
class KmvPropertySpec extends SparkSpec {
  import spark.implicits._

  private def modelHash(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s.getBytes("UTF-8"))
    val u = (0 until 8).foldLeft(0L)((acc, i) => (acc << 8) | (d(i) & 0xffL))
    u >>> 4
  }

  private val genKey: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(12)),
    Gen.oneOf("", ":", "a b", "日本", "x" * 50),
    Gen.choose(0, 300).map(i => s"key$i")) // forced duplicates

  test("sketch == model bottom-k; split-merge == whole-set sketch") {
    val prop = Prop.forAllNoShrink(
      Gen.listOfN(120, genKey), Gen.choose(2, 40),
      Gen.listOfN(120, Gen.oneOf(0, 1))) { (keys, k, sides) =>
      val df = keys.toDF("k")
      val got = Profile.kmvSketch(df, col("k"), k)
        .orderBy("h").as[Long].collect().toSeq
      val want = keys.map(modelHash).distinct.sorted.take(k)
      val split = keys.zip(sides)
      val left = split.filter(_._2 == 0).map(_._1).toDF("k")
      val right = split.filter(_._2 == 1).map(_._1).toDF("k")
      val merged = Profile.kmvMerge(
          Profile.kmvSketch(left, col("k"), k)
            .unionByName(Profile.kmvSketch(right, col("k"), k)), k)
        .orderBy("h").as[Long].collect().toSeq
      if (got != want || merged != want)
        println(s"MISMATCH k=$k got=$got want=$want merged=$merged")
      got == want && merged == want
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25).withWorkers(1), prop)
    assert(result.passed, s"property falsified: ${result.status}")
  }
}
