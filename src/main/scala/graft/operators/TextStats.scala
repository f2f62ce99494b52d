package graft.operators

import graft.functions.{TextFunctions, TopN}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level token statistics — vocabulary mining over a document table.
  */
object TextStats {

  /** The `k` most frequent tokens per group (e.g. per language), with
    * deterministic ordering: count descending, token ascending.
    *
    * Two bounded aggregations, no windows: explode → per-(group, token)
    * count (partial map-side combine collapses repeated tokens before the
    * shuffle) → per-group bounded TopN heap ([[graft.functions.TopNRows]],
    * map-side again). The token universe never sorts in full anywhere —
    * a `row_number` window over (group ORDER BY cnt) would sort every
    * group's whole vocabulary in one task.
    */
  def topTokensPerGroup(df: DataFrame, groupCols: Seq[String], text: Column,
                        k: Int): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val toks = df.select(
      groupCols.map(col) :+ explode(TextFunctions.tokens(text)).as("token"): _*)
    val counts = toks.groupBy((groupCols :+ "token").map(col): _*)
      .agg(count(lit(1)).as("cnt"))
    counts.groupBy(groupCols.map(col): _*)
      .agg(TopN.rows(
        struct(col("token"), col("cnt")),
        struct((-col("cnt")).as("neg_cnt"), col("token")),
        k, isMax = false).as("__top"))
      .select(groupCols.map(col) :+ posexplode(col("__top")).as(Seq("__pos", "__t")): _*)
      .select(groupCols.map(col) ++ Seq(
        col("__t.token").as("token"), col("__t.cnt").as("cnt"),
        (col("__pos") + 1).cast("long").as("rank")): _*)
  }
}
