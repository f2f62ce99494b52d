package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based differential test for reciprocal-rank fusion: random
  * ranked lists (1-4 lists, partially overlapping id universes, ranks a
  * permutation of 1..len per list) against a driver-side mirror that sums
  * the per-list terms in the same fixed left-to-right order.
  */
class RrfPropertySpec extends SparkSpec {
  import spark.implicits._

  private val genLists: Gen[List[Map[Long, Long]]] = for {
    nLists <- Gen.choose(1, 4)
    lists <- Gen.listOfN(nLists, for {
      len <- Gen.choose(1, 12)
      // ids from a small shared universe so lists overlap but differ
      ids <- Gen.pick(len, 0L until 20L)
    } yield ids.zipWithIndex.map { case (id, i) => id -> (i + 1).toLong }.toMap)
  } yield lists

  test("rrfFuse == driver-side mirror on random ranked lists") {
    val prop = Prop.forAll(genLists) { lists =>
      val dfs = lists.map(_.toSeq.toDF("id", "rank"))
      val k = 50 // above any universe size: the full fused ordering
      val got = Search.rrfFuse(dfs, "id", "rank", k = k, c = 60)
        .select("id", "rank", "rrf")
        .as[(Long, Long, Double)].collect().sortBy(_._2).toList
      val ids = lists.flatMap(_.keys).distinct
      val expect = ids
        .map(i => i -> lists.map(_.get(i).map(r => 1.0 / (60.0 + r)).getOrElse(0.0))
          .reduce(_ + _))
        .sortBy { case (id, s) => (-s, id) }
        .zipWithIndex
        .map { case ((id, s), i) => (id, (i + 1).toLong, s) }
      got == expect
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
