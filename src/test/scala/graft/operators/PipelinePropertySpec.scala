package graft.operators

import graft.SparkSpec
import graft.streaming.{Event, EventStreams}
import org.scalacheck.{Gen, Prop, Test => SCTest}

import java.sql.Timestamp

/** Property-based differential tests for the round-6 operators: random
  * inputs against independent driver-loop reimplementations (the
  * JoinPropertySpec pattern) — catches join/aggregation bugs the
  * hand-picked fixtures can't.
  */
class PipelinePropertySpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  private val steps = Seq("view", "click", "purchase")

  private val genEvents: Gen[List[(Long, Int, String)]] =
    Gen.listOfN(150, for {
      user <- Gen.choose(1L, 25L)
      minute <- Gen.choose(0, 90)
      tpe <- Gen.oneOf(steps ++ Seq("error", "signup"))
    } yield (user, minute, tpe))

  test("funnel == driver-loop earliest-qualifying chain on random event sets") {
    val prop = Prop.forAll(genEvents) { evs =>
      val df = evs.zipWithIndex.map { case ((u, m, t), i) =>
        Event(i.toLong, ts(m), u, t, 0.0)
      }.toDF().repartition(5)
      val got = EventStreams.funnel(df, "user_id", "ts", "event_type", steps)
        .select("user_id", "ts_1", "ts_2", "ts_3", "stage")
        .as[(Long, Timestamp, Option[Timestamp], Option[Timestamp], Int)]
        .collect().sortBy(_._1).toSeq
      // independent reference: per user, fold over the step list picking
      // the earliest event of the step at-or-after the previous pick
      val expected = evs.groupBy(_._1).toSeq.flatMap { case (u, es) =>
        def earliest(tpe: String, atOrAfter: Long): Option[Long] = {
          val c = es.filter(e => e._3 == tpe && e._2.toLong >= atOrAfter)
          if (c.isEmpty) None else Some(c.map(_._2.toLong).min)
        }
        earliest("view", Long.MinValue).map { t1 =>
          val t2 = earliest("click", t1)
          val t3 = t2.flatMap(earliest("purchase", _))
          val stage = if (t3.isDefined) 3 else if (t2.isDefined) 2 else 1
          (u, ts(t1.toInt), t2.map(m => ts(m.toInt)), t3.map(m => ts(m.toInt)), stage)
        }
      }.sortBy(_._1)
      got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  private val genDoc: Gen[String] = {
    val word = Gen.oneOf("the", "cat", "and", "of", "to", "####", "...",
      "12", "zebra", "extraordinarily", "a", "-")
    for {
      n <- Gen.choose(0, 30)
      ws <- Gen.listOfN(n, word)
      sep <- Gen.listOfN(math.max(n - 1, 0), Gen.oneOf(" ", "  ", "\n", "\n- "))
    } yield ws.headOption.fold("")(h =>
      h + sep.zip(ws.tail).map { case (s, w) => s + w }.mkString)
  }

  test("qualityRuleSignals == driver reimplementation on random documents") {
    val rules = TextStats.QualityRules(minTokens = 3, maxTokens = 25,
      minMeanWordLen = 2.0, maxMeanWordLen = 9.0, maxSymbolRatio = 0.3,
      maxBulletFrac = 0.5, minAlphaFrac = 0.5, minStopwordHits = 1)
    val stop = Set("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")
    val prop = Prop.forAll(Gen.listOfN(30, genDoc)) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text").repartition(4)
      val got = TextStats.qualityRuleSignals(df, "doc_id", "text", rules)
        .select("doc_id", "n_tokens", "mean_word_len", "symbol_ratio",
          "bullet_frac", "alpha_frac", "stopword_hits", "keep")
        .as[(Long, Long, Double, Double, Double, Double, Long, Int)]
        .collect().sortBy(_._1).toSeq
      val expected = docs.zipWithIndex.map { case (text, i) =>
        val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        val n = toks.length.toLong
        val meanLen = if (n > 0) toks.map(_.length.toLong).sum.toDouble / n else 0.0
        val sym = ("#".r.findAllIn(text).length +
          "\\.\\.\\.".r.findAllIn(text).length).toLong
        val symRatio = if (n > 0) sym.toDouble / n else 0.0
        // Spark's split keeps trailing empty strings (Java limit -1)
        val lines = text.split("\n", -1)
        val bullets = lines.count(_.matches("^\\s*[-*•].*"))
        val bulletFrac = bullets.toDouble / lines.length
        val alpha = toks.count(_.exists(c => c >= 'a' && c <= 'z')).toLong
        val alphaFrac = if (n > 0) alpha.toDouble / n else 0.0
        val hits = toks.count(stop).toLong
        val keep = if (n >= rules.minTokens && n <= rules.maxTokens &&
          meanLen >= rules.minMeanWordLen && meanLen <= rules.maxMeanWordLen &&
          symRatio <= rules.maxSymbolRatio && bulletFrac <= rules.maxBulletFrac &&
          alphaFrac >= rules.minAlphaFrac && hits >= rules.minStopwordHits) 1 else 0
        (i.toLong, n, meanLen, symRatio, bulletFrac, alphaFrac, hits, keep)
      }
      got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }
}
