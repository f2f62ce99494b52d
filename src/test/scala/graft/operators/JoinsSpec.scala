package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

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

  test("asOf forward attaches the earliest right row at-or-after; tolerance masks") {
    val trades = Seq(
      (1L, ts(5), "t1"), (1L, ts(20), "t2"), (2L, ts(10), "t3"), (3L, ts(1), "t4")
    ).toDF("uid", "ts", "trade")
    val quotes = Seq(
      (1L, ts(0), 100.0), (1L, ts(5), 101.0), (1L, ts(15), 102.0),
      (2L, ts(11), 50.0)
    ).toDF("uid", "ts", "px")
    val fwd = Joins.asOf(trades, quotes, Seq("uid"), "ts", "ts",
        direction = "forward")
      .select("trade", "r_px").as[(String, Option[Double])].collect().toMap
    assert(fwd("t1").contains(101.0)) // equal timestamp counts (>=)
    assert(fwd("t2").isEmpty)         // nothing after 10:20
    assert(fwd("t3").contains(50.0))  // the next quote
    assert(fwd("t4").isEmpty)
    // 1-minute tolerance: t3's next quote (60 s ahead) survives, a
    // 59-second bound masks it to null while the row itself remains
    val tight = Joins.asOf(trades, quotes, Seq("uid"), "ts", "ts",
        direction = "forward", tolerance = Some(59.0))
      .select("trade", "r_px").as[(String, Option[Double])].collect().toMap
    assert(tight("t3").isEmpty && tight.size == 4)
    val loose = Joins.asOf(trades, quotes, Seq("uid"), "ts", "ts",
        direction = "forward", tolerance = Some(60.0))
      .select("trade", "r_px").as[(String, Option[Double])].collect().toMap
    assert(loose("t3").contains(50.0))
    // backward tolerance: t2's latest prior (5 min back) masks under 240 s
    val back = Joins.asOf(trades, quotes, Seq("uid"), "ts", "ts",
        tolerance = Some(240.0))
      .select("trade", "r_px").as[(String, Option[Double])].collect().toMap
    assert(back("t2").isEmpty && back("t1").contains(101.0))
  }

  test("asOf nearest picks the closer side, ties break backward, tolerance masks") {
    val trades = Seq(
      (1L, ts(10), "t1"),  // back at 7 (d=3), fwd at 15 (d=5) -> back
      (1L, ts(14), "t2"),  // back at 7 (d=7), fwd at 15 (d=1) -> fwd
      (1L, ts(11), "t3"),  // back at 7 (d=4), fwd at 15 (d=4) -> tie: back
      (2L, ts(10), "t4"),  // only a forward candidate
      (3L, ts(10), "t5")   // no candidates
    ).toDF("uid", "ts", "trade")
    val quotes = Seq(
      (1L, ts(7), 100.0), (1L, ts(15), 101.0), (2L, ts(12), 50.0)
    ).toDF("uid", "ts", "px")
    val got = Joins.asOf(trades, quotes, Seq("uid"), "ts", "ts",
        direction = "nearest")
      .select("trade", "r_px").as[(String, Option[Double])].collect().toMap
    assert(got("t1").contains(100.0))
    assert(got("t2").contains(101.0))
    assert(got("t3").contains(100.0)) // equal distance -> backward
    assert(got("t4").contains(50.0))
    assert(got("t5").isEmpty)
    // tolerance (SECONDS — ts() steps are minutes): at 180 s, t1's
    // backward (3 min) survives, t2's forward (1 min) survives, t4's
    // forward (2 min) survives, t3 keeps nothing (both sides 4 min)
    val tol = Joins.asOf(trades, quotes, Seq("uid"), "ts", "ts",
        direction = "nearest", tolerance = Some(180.0))
      .select("trade", "r_px").as[(String, Option[Double])].collect().toMap
    assert(tol("t1").contains(100.0) && tol("t2").contains(101.0))
    assert(tol("t3").isEmpty && tol("t4").contains(50.0))
    // a masked NEAR side falls back to the in-tolerance far side:
    // trade at 13 -> back 6 min (masked at 180 s), fwd 2 min (kept)
    val fb = Joins.asOf(Seq((1L, ts(13), "x")).toDF("uid", "ts", "trade"),
        quotes, Seq("uid"), "ts", "ts",
        direction = "nearest", tolerance = Some(180.0))
      .select("r_px").as[Option[Double]].head()
    assert(fb.contains(101.0))
  }

  test("asOf with tolerance rejects ts types whose double cast is null") {
    // a DATE ts would cast to null inside the tolerance mask and silently
    // null EVERY match — the guard must fail fast instead
    val left = Seq((1L, java.sql.Date.valueOf("2024-01-02"), "x"))
      .toDF("uid", "ts", "payload")
    val right = Seq((1L, java.sql.Date.valueOf("2024-01-01"), 1.0))
      .toDF("uid", "ts", "v")
    val e = intercept[IllegalArgumentException] {
      Joins.asOf(left, right, Seq("uid"), "ts", "ts", tolerance = Some(5.0))
    }
    assert(e.getMessage.contains("numeric or timestamp"))
    // without tolerance the same DATE columns are fine (ordering only)
    val ok = Joins.asOf(left, right, Seq("uid"), "ts", "ts")
    assert(ok.count() == 1)
  }

  test("rangeJoin equals the naive inequality join, for every bin width") {
    val points = Seq((1L, 3.0), (2L, 17.5), (3L, 100.0), (4L, -5.0), (5L, 20.0))
      .toDF("pid", "x")
    val intervals = Seq((10L, 0.0, 10.0), (11L, 15.0, 20.0), (12L, 17.5, 17.5),
      (13L, -10.0, 250.0), (14L, 30.0, 40.0)).toDF("iid", "lo", "hi")
    val naive = points.join(intervals,
        points("x") >= intervals("lo") && points("x") <= intervals("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
    assert(naive.nonEmpty)
    for (w <- Seq(0.5, 1.0, 7.0, 1000.0)) {
      val got = Joins.rangeJoin(points, intervals, "x", "lo", "hi", binWidth = w)
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      assert(got == naive, s"binWidth=$w")
    }
  }

  test("rangeJoin works on timestamp columns") {
    val points = Seq((1L, ts(5)), (2L, ts(30)), (3L, ts(59))).toDF("pid", "t")
    val intervals = Seq((10L, ts(0), ts(10)), (11L, ts(25), ts(58))).toDF("iid", "lo", "hi")
    val got = Joins.rangeJoin(points, intervals, "t", "lo", "hi", binWidth = 600)
      .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq((1L, 10L), (2L, 11L)))
  }

  test("intervalOverlapJoin equals the naive overlap join, exactly once per pair") {
    val a = Seq((1L, 0.0, 10.0), (2L, 5.0, 6.0), (3L, 50.0, 90.0), (4L, 89.9, 200.0))
      .toDF("aid", "alo", "ahi")
    val b = Seq((10L, 9.0, 55.0), (11L, 300.0, 310.0), (12L, -20.0, 0.0))
      .toDF("bid", "blo", "bhi")
    val naive = a.join(b, a("alo") <= b("bhi") && b("blo") <= a("ahi"))
      .select("aid", "bid").as[(Long, Long)].collect().sorted.toSeq
    assert(naive.nonEmpty)
    for (w <- Seq(1.0, 8.0, 500.0)) {
      val got = Joins.intervalOverlapJoin(a, b, "alo", "ahi", "blo", "bhi", binWidth = w)
        .select("aid", "bid").as[(Long, Long)].collect().sorted.toSeq
      assert(got == naive, s"binWidth=$w") // sorted equality catches duplicates too
    }
  }

  test("range joins plan as hash equi-joins, never nested-loop/cartesian") {
    val points = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("pid", "x")
    val intervals = (1 to 50).map(i => (i.toLong, i * 2.0, i * 2.0 + 5)).toDF("iid", "lo", "hi")
    for (df <- Seq(
      Joins.rangeJoin(points, intervals, "x", "lo", "hi", binWidth = 5),
      Joins.intervalOverlapJoin(intervals, intervals
          .select(col("iid").as("jid"), col("lo").as("l2"), col("hi").as("h2")),
        "lo", "hi", "l2", "h2", binWidth = 5))) {
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("CartesianProduct") && !phys.contains("BroadcastNestedLoopJoin"),
        phys.linesIterator.take(20).mkString("\n"))
    }
  }

  test("mergeIntervals: overlap and touch coalesce, long interval swallows, per-key") {
    val iv = Seq(
      // key a: [1,5],[3,6] overlap; [6,8] touches; [10,11] separate
      ("a", 1L, 5L), ("a", 3L, 6L), ("a", 6L, 8L), ("a", 10L, 11L),
      // key b: early LONG interval swallows two later short ones, then gap
      ("b", 0L, 100L), ("b", 10L, 20L), ("b", 30L, 40L), ("b", 200L, 210L),
      // key c: single interval passes through
      ("c", 7L, 9L)
    ).toDF("k", "s", "e")
    val got = Joins.mergeIntervals(iv, Seq("k"), "s", "e")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("a", 1L, 8L, 3L), ("a", 10L, 11L, 1L),
      ("b", 0L, 100L, 3L), ("b", 200L, 210L, 1L),
      ("c", 7L, 9L, 1L)))
    // partitioning-independent
    val reGot = Joins.mergeIntervals(iv.repartition(5), Seq("k"), "s", "e")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(reGot == got)
    // NULL-bounded rows are dropped, never merged as garbage islands
    val withNulls = Seq(("c", Some(7L), Some(9L)), ("c", None, Some(5L)),
      ("c", Some(1L), None)).toDF("k", "s", "e")
    val cleaned = Joins.mergeIntervals(withNulls, Seq("k"), "s", "e")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(cleaned == Seq(("c", 7L, 9L, 1L)))
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
