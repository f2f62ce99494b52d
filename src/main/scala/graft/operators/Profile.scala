package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.RowOrdering
import org.apache.spark.sql.functions._

/** One-pass column profiler — the "what is in this table" primitive every
  * 100 TB curation pipeline runs before anything else.
  *
  * A single aggregation computes, per column: non-null count, distinct
  * count, min and max (as canonical strings). One scan, one partial+final
  * hash aggregate, output is one row per column — no per-column jobs, no
  * driver-side loops.
  *
  * `exactDistinct=false` (the default, and the only sane setting at scale)
  * uses HyperLogLog++ (`approx_count_distinct`), whose sketch merges
  * map-side. `exactDistinct=true` is for small-data oracle checks: Spark
  * plans multiple exact count-distincts via Expand (input replicated per
  * distinct column), which is O(rows × columns) — documented scale hazard.
  *
  * Non-orderable columns (maps) profile as count-only: their distinct /
  * min / max are null rather than an analysis error.
  */
object Profile {

  def profile(df: DataFrame, columns: Seq[String] = Nil,
              exactDistinct: Boolean = false): DataFrame = {
    val names = if (columns.isEmpty) df.columns.toSeq else columns
    val fieldType = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val aggs = names.flatMap { c =>
      val orderable = RowOrdering.isOrderable(fieldType(c))
      val distinct =
        if (!orderable) lit(null).cast("long")
        else if (exactDistinct) count_distinct(col(c))
        else approx_count_distinct(col(c))
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        distinct.as(s"__dst_$c"),
        (if (orderable) min(col(c)).cast("string") else lit(null).cast("string"))
          .as(s"__min_$c"),
        (if (orderable) max(col(c)).cast("string") else lit(null).cast("string"))
          .as(s"__max_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    finish(one, names)
  }

  /** Per-group quantiles of a numeric column. `exact=false` (default, the
    * scale path) uses the t-digest sketch (`approx_percentile`): fixed
    * memory per group, mergeable map-side. `exact=true` buffers every
    * group value in the aggregation buffer — O(|group|) memory, the
    * documented hazard — but interpolates precisely (used by the oracle
    * battery, where quantile definitions must match DuckDB bit-for-bit).
    */
  def groupQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     probs: Seq[Double], exact: Boolean = false): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1), "probs in [0,1]")
    val aggsQ = probs.map { p =>
      val name = s"p${(p * 100).round}"
      if (exact) percentile(col(valueCol), lit(p)).as(name)
      else percentile_approx(col(valueCol), lit(p), lit(10000)).as(name)
    }
    df.groupBy(groupCols.map(col): _*).agg(aggsQ.head, aggsQ.tail: _*)
  }

  private def finish(one: DataFrame, names: Seq[String]): DataFrame = {
    val perCol = names.map { c =>
      struct(lit(c).as("column"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__dst_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))
    }
    one.select(explode(array(perCol: _*)).as("__p")).select("__p.*")
  }
}
