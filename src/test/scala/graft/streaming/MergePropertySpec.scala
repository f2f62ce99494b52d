package graft.streaming

import graft.SparkSpec
import graft.operators.Lake
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based differential test for the CDC merge paths: random
  * changelog batches (key collisions, version ties broken by the LWW
  * tie rule, deletes, late arrivals, empty batches) folded through
  * (a) the flat atomic-swap merge, (b) the partitioned copy-on-write
  * merge, and (c) one-shot batch `Lake.latestSnapshot` over the whole
  * log — all three must land on the identical live state.
  */
class MergePropertySpec extends SparkSpec {
  import spark.implicits._

  // (key, value, version, delete) — tiny key space forces collisions,
  // tiny version space forces cross-batch late arrivals and ties
  private val genRow: Gen[(String, Long, Long, Boolean)] = for {
    k <- Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h")
    v <- Gen.choose(0L, 99L)
    ver <- Gen.choose(1L, 6L)
    del <- Gen.frequency(4 -> false, 1 -> true)
  } yield (k, v, ver, del)

  private val genBatches: Gen[List[List[(String, Long, Long, Boolean)]]] =
    Gen.choose(1, 4).flatMap(nb =>
      Gen.listOfN(nb, Gen.choose(0, 7).flatMap(n => Gen.listOfN(n, genRow))))

  test("flat merge == partitioned merge == one-shot latestSnapshot, any log") {
    val prop = Prop.forAll(genBatches) { batches =>
      val root = java.nio.file.Files.createTempDirectory("graft_mergeprop").toString
      val part = Some(("kp", substring(col("k"), 1, 1)))
      batches.foreach { b =>
        val df = b.toDF("k", "v", "ver", "del")
        ChangeStreams.mergeBatch(df, Seq("k"), Seq("ver", "v"), col("del"),
          s"$root/flat")
        ChangeStreams.mergeBatch(df, Seq("k"), Seq("ver", "v"), col("del"),
          s"$root/part", snapshotPartition = part)
      }
      def live(p: String, pc: Option[String]) =
        if (!new java.io.File(p).exists()) Set.empty[(String, Long, Long)]
        else ChangeStreams.readSnapshot(spark, p, pc)
          .select("k", "v", "ver").as[(String, Long, Long)].collect().toSet
      val flat = live(s"$root/flat", None)
      val parted = live(s"$root/part", Some("kp"))
      val all = batches.flatten
      val oneShot =
        if (all.isEmpty) Set.empty[(String, Long, Long)]
        else Lake.latestSnapshot(all.toDF("k", "v", "ver", "del"),
            Seq("k"), Seq(col("ver"), col("v")), isDelete = col("del"))
          .select("k", "v", "ver").as[(String, Long, Long)].collect().toSet
      flat == parted && (all.isEmpty || flat == oneShot)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
