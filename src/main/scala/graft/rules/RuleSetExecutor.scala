package graft.rules

import graft.model.RuleDefinition
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-rule execution: UNION DISTINCT of per-rule results
  * (reference `RuleDefinitionExecutor.Executes`,
  * `RuleDefinitionExecutor.cs:8-28` — per-rule evaluation, `Concat`, then
  * `HashSet` dedup).
  *
  * Multi-query optimization the reference lacks (it re-scans the full input
  * once per rule, `RuleDefinitionExecutor.cs:15-22`): all FILTER-ONLY rules
  * are fused into a single scan with an OR of their predicates — equivalent
  * to union-then-distinct because distinct collapses per-rule multiplicity.
  * At 100 TB this turns N full-table scans into one. Aggregating rules still
  * run individually (their group-by shapes differ), then everything unions
  * by name and deduplicates (one hash-exchange).
  */
object RuleSetExecutor {

  def execute(df: DataFrame, rule: RuleDefinition,
              params: Map[String, Any] = Map.empty): DataFrame =
    RuleEvaluator(df, rule, params)

  /** Rule-hit analytics: ONE scan evaluating every rule's predicate as a
    * boolean tag column (named by rule, falling back to `rule_<i>`), plus a
    * `__matched_any` column. The workhorse for "which rules fire on which
    * rows / how often" dashboards — N rules cost one pass, no union, no
    * shuffle.
    */
  def tagAll(df: DataFrame, rules: Seq[RuleDefinition],
             params: Map[String, Any] = Map.empty): DataFrame = {
    require(rules.nonEmpty, "at least one rule is required")
    require(rules.forall(_.aggregation.isEmpty),
      "tagAll applies to filter rules (aggregating rules change the row shape)")
    val named = rules.zipWithIndex.map { case (r, i) =>
      val name = if (r.name != null && r.name.nonEmpty) r.name else s"rule_$i"
      name -> RuleEvaluator.predicate(df, r, params)
    }
    // a rule named like an input column would silently SHADOW the data
    // column (and corrupt later predicates referencing it) — reject both
    // kinds of collision up front
    val lowerInput = df.columns.map(_.toLowerCase).toSet
    val shadowing = named.map(_._1).filter(n => lowerInput.contains(n.toLowerCase))
    require(shadowing.isEmpty,
      s"rule names collide with input columns: ${shadowing.mkString(", ")}")
    val dupes = named.map(_._1.toLowerCase).groupBy(identity).filter(_._2.size > 1).keys
    require(dupes.isEmpty, s"duplicate rule names: ${dupes.mkString(", ")}")
    // ONE projection for all N rules — a per-rule withColumn fold costs
    // O(N²) analysis at rule-catalog scale (thousands of rules)
    df.select(df.columns.map(col) ++
      named.map { case (name, pred) => pred.as(name) } :+
      named.map(_._2).reduce(_ || _).as("__matched_any"): _*)
  }

  def executeAll(df: DataFrame, rules: Seq[RuleDefinition],
                 params: Map[String, Any] = Map.empty): DataFrame = {
    require(rules.nonEmpty, "at least one rule is required")
    val (filterOnly, aggregating) = rules.partition(_.aggregation.isEmpty)
    val fused: Option[DataFrame] =
      if (filterOnly.isEmpty) None
      else {
        val preds = filterOnly.map(r => RuleEvaluator.rawPredicate(df, r, params))
        Some(df.filter(preds.reduce(_ || _)))
      }
    val parts = fused.toSeq ++ aggregating.map(r => RuleEvaluator(df, r, params))
    val schemas = parts.map(_.columns.toSeq).distinct
    if (schemas.length > 1)
      throw new graft.model.RuleValidator.RuleValidationException(
        "Rules in one set must produce union-compatible schemas; got " +
          schemas.map(_.mkString("(", ",", ")")).mkString(" vs ") +
          ". Count-aggregating rules cannot be unioned with row-shaped results " +
          "(the reference engine fails the equivalent cast, RuleDefinitionExecutor.cs:38).")
    parts.reduce(_ unionByName _).dropDuplicates()
  }
}
