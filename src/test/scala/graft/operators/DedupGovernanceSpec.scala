package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the near-dup governance reports on engineered graphs where the
  * right answer is computable by hand.
  */
class DedupGovernanceSpec extends SparkSpec {
  import spark.implicits._

  // docs: source A = ids 1-10 (w=10 each), source B = ids 11-20 (w=5 each)
  private val docs = ((1 to 10).map(i => (i.toLong, "A", 10L)) ++
    (11 to 20).map(i => (i.toLong, "B", 5L)))
    .toDF("doc_id", "source", "w")

  test("dupMassByGroup: exact counts, weighted mass, integer ppm; duplicate pairs don't double-count") {
    // pairs touch ids 1,2,3 (A) and 11 (B); (1,2) appears twice and 3
    // appears on both sides of two pairs — members must dedup
    val pairs = Seq((1L, 2L), (2L, 1L), (3L, 11L), (3L, 2L)).toDF("id1", "id2")
    val got = Dedup.dupMassByGroup(docs, "doc_id", "source", pairs,
        weight = col("w"))
      .orderBy("group").collect()
    val a = got(0); val b = got(1)
    assert(a.getString(0) == "A" && a.getLong(1) == 10 && a.getLong(2) == 3)
    assert(a.getAs[Long]("dup_ppm") == 300000L)
    assert(a.getAs[Long]("w_total") == 100L && a.getAs[Long]("w_dup") == 30L)
    assert(a.getAs[Long]("dup_w_ppm") == 300000L)
    assert(b.getString(0) == "B" && b.getLong(2) == 1)
    assert(b.getAs[Long]("dup_ppm") == 100000L)
    assert(b.getAs[Long]("w_dup") == 5L)
  }

  test("dupMassByGroup: empty pair table reads zero everywhere, default weight 1") {
    val none = Seq.empty[(Long, Long)].toDF("id1", "id2")
    val got = Dedup.dupMassByGroup(docs, "doc_id", "source", none)
      .orderBy("group").collect()
    got.foreach { r =>
      assert(r.getAs[Long]("n_dup") == 0L && r.getAs[Long]("dup_ppm") == 0L)
      assert(r.getAs[Long]("w_total") == 10L) // weight defaults to 1 per doc
    }
  }

  test("dupMassByGroup: all-zero and all-NULL weight groups report dup_w_ppm 0, not NULL") {
    // group Z carries zero weight, group N all-NULL weight: w_total is 0
    // resp. NULL, and x DIV 0 / x DIV NULL would silently make dup_w_ppm
    // NULL — the guard must read 0 ("no duplicate mass") instead
    val weird = Seq((1L, "Z", Some(0L)), (2L, "Z", Some(0L)),
        (3L, "N", None: Option[Long]), (4L, "N", None))
      .toDF("doc_id", "source", "w")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("id1", "id2")
    val got = Dedup.dupMassByGroup(weird, "doc_id", "source", pairs,
        weight = col("w")).orderBy("group").collect()
    got.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("dup_w_ppm")),
        s"dup_w_ppm NULL for group ${r.getString(0)}")
      assert(r.getAs[Long]("dup_w_ppm") == 0L)
    }
  }

  test("clusterSizeHistogram counts singletons and transitive clusters") {
    // {1,2,3} one cluster (transitive), {4,5} one pair, 6..20 singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id1", "id2")
    val comp = Dedup.connectedComponents(docs, "doc_id", pairs)
    val hist = Dedup.clusterSizeHistogram(comp)
      .orderBy("size").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(hist == Seq((1L, 15L), (2L, 1L), (3L, 1L)))
  }
}
