package graft.rules

import graft.model.ConditionGroup
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{coalesce, lit}
import org.apache.spark.sql.types.StructType

/** Folds a recursive [[ConditionGroup]] into one boolean [[Column]]
  * (reference `BuildGroupBody`, `IQueryableRuleEvaluator.cs:86-118`).
  *
  * Children are folded leaf-conditions-first then subgroups, with
  * short-circuit AND (default) or OR when `LogicalOperator == "OR"`
  * (`:108-110`); an empty group folds to TRUE (`:103-106`); `Negate` wraps
  * the folded body in NOT (`:112-115`). Spark's `And`/`Or` short-circuit in
  * codegen, so the mapping is 1:1.
  *
  * Two-valued null semantics, pushdown-preserving: at a FILTER boundary,
  * a null predicate result drops the row exactly like `false`, and null
  * propagates through AND/OR monotonically — so leaves need no wrapping and
  * the plain predicate tree stays parquet-pushable (`PushedFilters`). The
  * ONLY non-monotone spot is `Negate`: `NOT null` must evaluate to the
  * reference's `NOT false = true`, so exactly there the body is coalesced
  * to false before negation.
  */
object GroupCompiler {

  def compile(schema: StructType, g: ConditionGroup, params: Map[String, Any]): Column = {
    val children: Seq[Column] =
      g.conditions.map(ConditionCompiler.compile(schema, _, params)) ++
        g.groups.map(compile(schema, _, params))
    val body = children match {
      case Seq() => lit(true)
      case cs if g.logicalOperator != null && g.logicalOperator.equalsIgnoreCase("OR") =>
        cs.reduce(_ || _)
      case cs => cs.reduce(_ && _)
    }
    if (g.negate) !coalesce(body, lit(false)) else body
  }
}
