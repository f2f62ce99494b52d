package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class LshTuningSpec extends AnyFunSuite {

  test("matches the measured sweep points") {
    // battery corpus (sf0.1 embeddings): hand tuning was (3, 8)
    val small = LshTuning.forCorpus(2000, threshold = 0.45)
    assert(small.planes == 3)
    assert(small.tables >= 8 && small.tables <= 16)
    // 10x corpus: ScaleTen's plane sweep measured planes 6 as the
    // recall-recovering point (with 32 tables)
    val big = LshTuning.forCorpus(20000, threshold = 0.45)
    assert(big.planes >= 6 && big.planes <= 7)
    assert(big.tables <= 64)
  }

  test("planes grow logarithmically with corpus size; bucket occupancy stays capped") {
    val sizes = Seq(1000L, 10000L, 100000L, 1000000L, 100000000L, 10000000000L)
    val params = sizes.map(n => (n, LshTuning.forCorpus(n, 0.8)))
    // monotone non-decreasing planes
    assert(params.map(_._2.planes) == params.map(_._2.planes).sorted)
    // occupancy n / 2^planes never exceeds the target
    params.foreach { case (n, p) =>
      assert(n.toDouble / math.pow(2, p.planes) <= 250.0 + 1e-9,
        s"n=$n planes=${p.planes}")
    }
    // 10 BILLION vectors — the 100 TB regime — still a sane table count
    assert(params.last._2.planes <= 32 && params.last._2.tables <= 64)
  }

  test("higher threshold needs fewer tables (pairs collide more per table)") {
    val loose = LshTuning.forCorpus(100000, threshold = 0.45)
    val tight = LshTuning.forCorpus(100000, threshold = 0.9)
    assert(tight.tables < loose.tables)
  }

  test("recall model: 1-(1-p)^tables >= target when tables uncapped") {
    for (n <- Seq(5000L, 50000L); thr <- Seq(0.6, 0.8, 0.9)) {
      val p = LshTuning.forCorpus(n, thr, maxTables = 100000)
      val theta = math.acos(thr)
      val pc = math.pow(1 - theta / math.Pi, p.planes.toDouble)
      val recall = 1 - math.pow(1 - pc, p.tables.toDouble)
      assert(recall >= 0.95 - 1e-9, s"n=$n thr=$thr recall=$recall")
    }
  }
}
