package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Join operators Spark lacks natively, built scale-first.
  */
object Joins {

  /** AS-OF (left) join: for each left row, attach the LATEST right row with
    * `right.ts <= left.ts` per key — the canonical feature-attachment join
    * of training-data pipelines ("state of the user at event time").
    *
    * Implementation is the union-sort trick, NOT a range join: tag both
    * sides, union, one window pass per key ordered by (ts, side) carrying
    * the last-seen right row forward. Cost = ONE shuffle + sort of
    * |L| + |R| rows — no range-condition row explosion, no broadcast
    * requirement, and AQE handles skewed keys. Right columns come back
    * prefixed (`rightPrefix`); left rows with no prior right row get nulls.
    * Ties on (key, ts) between right rows break toward the largest
    * remaining right-row ordering (deterministic).
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String,
           rightPrefix: String = "r_"): DataFrame = {
    val rRenamed = right.columns.filterNot(keys.contains)
      .foldLeft(right)((d, c) => d.withColumnRenamed(c, rightPrefix + c))
    val lPayload = left.columns.filterNot(keys.contains)
    val rPayload = rRenamed.columns.filterNot(keys.contains)
    val lType = StructType(left.schema.fields.filterNot(f => keys.contains(f.name)))
    val rType = StructType(rRenamed.schema.fields.filterNot(f => keys.contains(f.name)))

    val lSide = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__t"), lit(1).as("__src"),
        struct(lPayload.map(col): _*).as("__l"),
        lit(null).cast(rType).as("__r")): _*)
    val rSide = rRenamed.select(
      keys.map(col) ++ Seq(
        col(rightPrefix + rightTs).as("__t"), lit(0).as("__src"),
        lit(null).cast(lType).as("__l"),
        struct(rPayload.map(col): _*).as("__r")): _*)

    // right rows sort BEFORE left rows at equal ts (__src 0 < 1) => `<=` asof.
    // The right-row tiebreak orders only ORDERABLE right columns — a map
    // column in the payload would fail analysis inside an ordering struct
    // (same guard Dedup.exact applies).
    val rOrderable = rType.fields.filter(f =>
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(f.dataType))
      .map(f => col(s"__r.${f.name}"))
    val tieBreak: Seq[org.apache.spark.sql.Column] =
      if (rOrderable.isEmpty) Nil else Seq(struct(rOrderable: _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t") +: col("__src") +: tieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    lSide.unionByName(rSide)
      .withColumn("__carried", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__src") === 1)
      .select(keys.map(col) ++
        lPayload.map(c => col(s"__l.$c").as(c)) ++
        rPayload.map(c => col(s"__carried.$c").as(c)): _*)
  }

  /** Inner equi-join with KEY SALTING for skew: the left side spreads each
    * hot key across `saltBuckets` partitions (deterministic per-row salt),
    * the right side replicates `saltBuckets`×. Result is exactly the plain
    * join; the shuffle's largest partition shrinks by the salt factor.
    * Use when one side has power-law keys and the other is too big to
    * broadcast (AQE's skew handling covers sort-merge joins; this covers
    * the cases it can't re-split, e.g. a single monster key feeding an
    * aggregation).
    */
  def saltedInner(left: DataFrame, right: DataFrame, keys: Seq[String],
                  saltBuckets: Int): DataFrame = {
    val lSalt = pmod(xxhash64(struct(left.columns.map(col): _*)), lit(saltBuckets))
      .cast("int")
    val l = left.withColumn("__salt", lSalt)
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }
}
