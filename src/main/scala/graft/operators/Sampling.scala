package graft.operators

import graft.functions.TopN
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sampling operators for training-data pipelines.
  *
  * Both samplers are DETERMINISTIC: rows are ranked by a caller-supplied
  * order key (conventionally a cryptographic hash of stable columns, e.g.
  * `md5(text)` — uniform, reproducible across runs and engines, and
  * independent of partitioning). `df.sample()` by contrast is neither exact
  * in size nor stable under repartitioning — useless for reproducible
  * dataset curation.
  */
object Sampling {

  /** Exact-N per stratum: the `n` rows with the smallest `orderBy` key in
    * each distinct combination of `strataCols`.
    *
    * Plans as ONE ObjectHashAggregate over [[graft.functions.TopNRows]]:
    * each map task reduces its share of a stratum to ≤ n rows before the
    * shuffle, so a hot stratum ships n·partitions rows instead of its full
    * population — unlike the `row_number() OVER (PARTITION BY strata)`
    * formulation, which sorts whole strata in single tasks and dies on
    * skewed strata at scale.
    */
  def stratifiedExactN(df: DataFrame, strataCols: Seq[String], n: Int,
                       orderBy: Seq[Column]): DataFrame = {
    require(strataCols.nonEmpty, "strataCols must be non-empty")
    val rowStruct = struct(df.columns.map(col): _*)
    df.groupBy(strataCols.map(col): _*)
      .agg(TopN.rows(rowStruct, struct(orderBy: _*), n, isMax = false).as("__rows"))
      .select(explode(col("__rows")).as("__row"))
      .select("__row.*")
  }

  /** Exact-N uniform sample of the whole table: the `n` rows with the
    * smallest `orderBy` key. Plans as TakeOrderedAndProject — each partition
    * keeps its local top-n, the driver merges n·partitions rows; no shuffle
    * of the data.
    */
  def uniformExactN(df: DataFrame, n: Int, orderBy: Seq[Column]): DataFrame =
    df.orderBy(orderBy: _*).limit(n)
}
