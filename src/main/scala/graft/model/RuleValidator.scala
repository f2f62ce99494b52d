package graft.model

import org.apache.spark.sql.types.StructType

/** Semantic validation of a rule against a DataFrame schema
  * (reference: `RuleValidator.cs:8-54`). All property references resolve
  * case-insensitively (`RuleValidator.cs:10-13`).
  *
  * Deliberate divergence (SURVEY §2.6): the reference comments out the
  * `AggregateProperty` existence check (`RuleValidator.cs:50-53`) and instead
  * crashes later with a null-reflection error; we validate it up front — the
  * accepted-query set is unchanged, only the failure mode improves.
  */
object RuleValidator {

  final class RuleValidationException(msg: String) extends IllegalArgumentException(msg)

  /** Resolves `name` to the schema's actual field name, case-insensitively. */
  def resolve(schema: StructType, name: String): Option[String] =
    schema.fields.collectFirst { case f if f.name.equalsIgnoreCase(name) => f.name }

  def validate(schema: StructType, rule: RuleDefinition): Unit = {
    rule.conditions.foreach(validateGroup(schema, _))
    rule.groupBy.foreach { g =>
      if (resolve(schema, g).isEmpty)
        fail(s"GroupBy property '$g' does not exist on the input schema.")
    }
    if (rule.groupBy.nonEmpty && rule.aggregation.isEmpty)
      fail("GroupBy requires an Aggregation.") // reference: RuleValidator.cs:45-48
    rule.aggregation.foreach { a =>
      if (a.aggregateProperty == null || a.aggregateProperty.isEmpty)
        fail("AggregateProperty must be provided.") // reference: IQueryableRuleEvaluator.cs:43-46
      if (resolve(schema, a.aggregateProperty).isEmpty)
        fail(s"Aggregate property '${a.aggregateProperty}' does not exist on the input schema.")
      val fn = a.aggregateFunction
      if (!Set("min", "max", "count").contains(fn.toLowerCase))
        fail(s"Unsupported aggregate function '$fn'.")
    }
  }

  private def validateGroup(schema: StructType, g: ConditionGroup): Unit = {
    g.conditions.foreach { c =>
      if (resolve(schema, c.property).isEmpty)
        fail(s"Property '${c.property}' does not exist on the input schema.")
      // Nested Check/Then conditions of the If operator reference properties too.
      if (c.operator.equalsIgnoreCase("If")) c.value match {
        case o: RuleValue.Obj =>
          Seq("Check", "Then").foreach { k =>
            o.get(k) match {
              case Some(inner: RuleValue.Obj) =>
                inner.get("Property").collect { case RuleValue.Str(p) =>
                  if (resolve(schema, p).isEmpty)
                    fail(s"Property '$p' (inside If.$k) does not exist on the input schema.")
                }
              case _ => fail(s"If operator requires an object value with Check and Then.")
            }
          }
        case _ => fail("If operator requires an object value with Check and Then.")
      }
    }
    g.groups.foreach(validateGroup(schema, _))
  }

  private def fail(msg: String): Nothing = throw new RuleValidationException(msg)
}
