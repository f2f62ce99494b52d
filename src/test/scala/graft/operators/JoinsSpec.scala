package graft.operators

import graft.SparkSpec

import java.sql.Timestamp

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("asOf attaches the latest right row at-or-before the left timestamp") {
    val trades = Seq(
      (1L, ts(5), "t1"), (1L, ts(20), "t2"), (2L, ts(10), "t3"), (3L, ts(1), "t4")
    ).toDF("uid", "ts", "trade")
    val quotes = Seq(
      (1L, ts(0), 100.0), (1L, ts(5), 101.0), (1L, ts(15), 102.0),
      (2L, ts(11), 50.0)
    ).toDF("uid", "ts", "px")
    val got = Joins.asOf(trades, quotes, Seq("uid"), "ts", "ts")
      .select("trade", "r_px").as[(String, Option[Double])].collect().toMap
    assert(got("t1").contains(101.0)) // equal timestamp counts (<=)
    assert(got("t2").contains(102.0)) // latest prior
    assert(got("t3").isEmpty)         // quote is later than the trade
    assert(got("t4").isEmpty)         // no quotes for uid 3
  }

  test("saltedInner equals the plain inner join") {
    val left = (1 to 500).map(i => (i % 3, i)).toDF("k", "v")   // hot keys
    val right = Seq((0, "a"), (1, "b"), (1, "c"), (5, "z")).toDF("k", "w")
    val plain = left.join(right, Seq("k")).select("k", "v", "w")
      .as[(Int, Int, String)].collect().sorted.toSeq
    val salted = Joins.saltedInner(left, right, Seq("k"), saltBuckets = 8)
      .select("k", "v", "w").as[(Int, Int, String)].collect().sorted.toSeq
    assert(salted == plain && plain.nonEmpty)
  }
}
