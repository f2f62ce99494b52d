package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based differential test for the distributed connected
  * components: random graphs (including chains — the worst case for plain
  * label propagation — plus cliques, stars, and isolated nodes) against a
  * driver-side union-find.
  */
class CcPropertySpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonical label = smallest node id reachable
    nodes.map(n => n -> find(n)).toMap
  }

  private val genGraph: Gen[(Int, List[(Int, Int)])] = for {
    n <- Gen.choose(2, 40)
    shape <- Gen.oneOf("random", "chain", "clique", "stars")
    edges <- shape match {
      case "chain" => Gen.const((0 until n - 1).map(i => (i, i + 1)).toList)
      case "clique" =>
        val k = math.min(n, 8)
        Gen.const((for { i <- 0 until k; j <- i + 1 until k } yield (i, j)).toList)
      case "stars" => Gen.const((1 until n).map(i => (i % 3, i)).filter(p => p._1 != p._2).toList)
      case _ => Gen.listOfN(n, for {
        a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1) if a != b
      } yield (a, b))
    }
  } yield (n, edges)

  test("connectedComponents == driver-side union-find on random graphs") {
    val prop = Prop.forAll(genGraph) { case (n, edges) =>
      val nodes = (0L until n.toLong)
      val nodesDf = nodes.toDF("id")
      val pairsDf = edges.map { case (a, b) => (a.toLong, b.toLong) }.toDF("id1", "id2")
      val got = Dedup.connectedComponents(nodesDf, "id", pairsDf)
        .as[(Long, Long)].collect().toMap
      val expected = unionFind(nodes, edges.map { case (a, b) => (a.toLong, b.toLong) })
      got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("a chain longer than 2^maxIter rounds converges (pointer jumping)") {
    // 300-node chain: plain 1-hop propagation needs ~300 rounds; hash-min
    // with pointer jumping must finish within the default 25
    val n = 300L
    val nodes = (0L until n).toDF("id")
    val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("id1", "id2")
    val got = Dedup.connectedComponents(nodes, "id", pairs)
      .as[(Long, Long)].collect().toMap
    assert(got.values.toSet == Set(0L))
  }
}
