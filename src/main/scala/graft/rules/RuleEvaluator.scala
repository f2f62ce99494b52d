package graft.rules

import graft.model.{Aggregation, RuleDefinition, RuleValidator}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Applies one [[RuleDefinition]] to a DataFrame
  * (reference `IQueryableRuleEvaluator.ApplyRule`,
  * `IQueryableRuleEvaluator.cs:11-57`).
  *
  * Pipeline: validate → filter (skipped entirely when the rule has no
  * conditions, `:23-28`) → optional group-by + aggregate (`:36-55`).
  *
  * Scale notes (100 TB design point):
  *  - The predicate is one narrow `filter` over declarative `Column`s —
  *    Catalyst pushes it into the scan and whole-stage-codegens it; no UDFs.
  *  - argmin/argmax uses `min_by`/`max_by`, which plans as a hash aggregate
  *    with map-side partial aggregation: ONE shuffle of one struct per
  *    (partition, group), instead of the window-function alternative that
  *    shuffles and sorts every surviving row.
  */
object RuleEvaluator {

  val SupportsMultiKeyGroupBy = true // legacy engine semantics, AggregationEngine.cs:12-25

  def apply(df: DataFrame, rule: RuleDefinition,
            params: Map[String, Any] = Map.empty): DataFrame = {
    RuleValidator.validate(df.schema, rule)
    val filtered = rule.conditions match {
      case Some(g) if !g.isEmpty =>
        // No root coalesce: a null predicate drops the row at the filter
        // boundary exactly like false, and leaving the tree bare keeps it
        // parquet-pushable; only Negate needs null-collapsing (see
        // GroupCompiler).
        df.filter(GroupCompiler.compile(df.schema, g, params))
      case _ => df
    }
    rule.aggregation match {
      case None      => filtered
      case Some(agg) => applyAggregate(filtered, rule.groupBy, agg)
    }
  }

  /** The rule's filter as a bare Column — used by [[RuleSetExecutor]] to fuse
    * several filter-only rules into a single scan.
    */
  def predicate(df: DataFrame, rule: RuleDefinition,
                params: Map[String, Any] = Map.empty): Column = {
    coalesce(rawPredicate(df, rule, params), lit(false))
  }

  /** Like [[predicate]] but without the null-collapsing wrapper — safe (and
    * pushdown-friendly) wherever the consumer is a filter/OR context in
    * which null behaves as false.
    */
  private[rules] def rawPredicate(df: DataFrame, rule: RuleDefinition,
                                  params: Map[String, Any]): Column = {
    RuleValidator.validate(df.schema, rule)
    rule.conditions match {
      case Some(g) if !g.isEmpty => GroupCompiler.compile(df.schema, g, params)
      case _ => lit(true)
    }
  }

  /** Group-by + aggregate (SURVEY §2.4).
    *
    *  - `Min`/`Max` are ARGMIN/ARGMAX: the whole row whose aggregate property
    *    is smallest/largest per group (`IQueryableRuleEvaluator.cs:66-70`).
    *  - Multi-key grouping and the empty-`GroupBy` grand aggregate follow the
    *    legacy engine (`AggregationEngine.cs:12-25`) — the active engine's
    *    single-key limitation (`IQueryableRuleEvaluator.cs:36-40`) is a
    *    strict subset.
    *  - `Count` follows the legacy engine (`AggregationEngine.cs:45-46`);
    *    the active engine declares it in the IR but throws (`:72-73`).
    *  - Ordering of a string-typed aggregate property is numeric (decimal
    *    cast), the legacy `ConvertToDecimal` semantics
    *    (`AggregationEngine.cs:75-87`): "10" sorts after "9".
    *  - Ties: deterministic full-row tie-break (the whole row participates in
    *    the ordering struct) — the reference's "first in input order" is
    *    meaningless under distributed execution, SURVEY §7.3.3.
    */
  private def applyAggregate(df: DataFrame, groupBy: Seq[String], agg: Aggregation): DataFrame = {
    val keys = groupBy.map(k => col(RuleValidator.resolve(df.schema, k).get))
    agg.aggregateFunction.toLowerCase match {
      case "count" =>
        val c = count(lit(1)).as("count")
        if (keys.isEmpty) df.agg(c) else df.groupBy(keys: _*).agg(c)
      case mm @ ("min" | "max") =>
        val aggName = RuleValidator.resolve(df.schema, agg.aggregateProperty).get
        val ord =
          if (df.schema(aggName).dataType == StringType)
            col(aggName).try_cast(ConditionCompiler.LiftType)
          else col(aggName)
        val rowStruct = struct(df.columns.map(col): _*)
        val ordStruct = struct(
          (ord.as("__graft_ord") +: df.columns.map(col)): _*)
        // custom hash-aggregable argmin/argmax (min_by/max_by with a struct
        // ordering key would force SortAggregate — see ArgExtremumRow docs)
        val a = graft.functions.ArgExtremum.argRow(rowStruct, ordStruct, isMax = mm == "max")
        val agged =
          if (keys.isEmpty) df.agg(a.as("__graft_row"))
          else df.groupBy(keys: _*).agg(a.as("__graft_row"))
        agged.select("__graft_row.*")
      case other =>
        throw new IllegalArgumentException(s"Unsupported aggregate function '$other'.")
    }
  }
}
