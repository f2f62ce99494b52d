package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("joining two co-bucketed tables plans WITHOUT a shuffle on either side") {
    val orders = (1L to 500L).map(i => (i, i % 37)).toDF("o_key", "o_cust")
    val items = (1L to 2000L).map(i => (i % 500 + 1, i)).toDF("o_key", "item")
    Bucketing.writeBucketed(orders, "bkt_orders", Seq("o_key"), numBuckets = 8)
    Bucketing.writeBucketed(items, "bkt_items", Seq("o_key"), numBuckets = 8)
    try {
      // bucketed scans need the per-file listing path, not AQE coalescing
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.readBucketed(spark, "bkt_orders")
        .join(Bucketing.readBucketed(spark, "bkt_items"), "o_key")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      // and it is still correct
      assert(joined.count() == 2000L)
      // bucketed groupBy on the join key also aggregates without exchange
      val agg = Bucketing.readBucketed(spark, "bkt_items")
        .groupBy("o_key").agg(count(lit(1)))
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_items")
    }
  }
}
