package graft.rules

import graft.SparkSpec
import graft.model.RuleJson

class RuleSetExecutorSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    ("a", 1), ("b", 5), ("c", 9), ("d", 5)
  ).toDF("k", "v")

  private def r(json: String) = RuleJson.parseRule(json)

  test("union distinct of overlapping filter rules = fused OR + distinct") {
    val rules = Seq(
      r("""{"Conditions":{"Conditions":[{"Property":"v","Operator":"GreaterThan","Value":4}]}}"""),
      r("""{"Conditions":{"Conditions":[{"Property":"v","Operator":"Equal","Value":5}]}}"""))
    val got = RuleSetExecutor.executeAll(df, rules)
      .select("k").as[String].collect().toSet
    assert(got == Set("b", "c", "d"))
  }

  test("fused plan scans the input once for N filter-only rules") {
    val rules = Seq(
      r("""{"Conditions":{"Conditions":[{"Property":"v","Operator":"Equal","Value":1}]}}"""),
      r("""{"Conditions":{"Conditions":[{"Property":"v","Operator":"Equal","Value":9}]}}"""),
      r("""{"Conditions":{"Conditions":[{"Property":"k","Operator":"Equal","Value":"b"}]}}"""))
    val plan = RuleSetExecutor.executeAll(df, rules).queryExecution.optimizedPlan
    val scans = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }
    assert(scans.length == 1, s"expected one fused scan, got ${scans.length}")
  }

  test("mixed filter + aggregating rules union by name and dedupe") {
    val rules = Seq(
      r("""{"Conditions":{"Conditions":[{"Property":"v","Operator":"GreaterThan","Value":8}]}}"""),
      r("""{"Conditions":{"Conditions":[]},"GroupBy":["v"],
           "Aggregation":{"AggregateProperty":"k","AggregateFunction":"Min"}}"""))
    val got = RuleSetExecutor.executeAll(df, rules)
      .select("k").as[String].collect().toSet
    // rule2 argmin per v-group: a (v=1), b (v=5), c (v=9); rule1 adds c (dup)
    assert(got == Set("a", "b", "c"))
  }

  test("mixing a Count rule with row-shaped rules fails with a clear error") {
    val rules = Seq(
      r("""{"Conditions":{"Conditions":[{"Property":"v","Operator":"GreaterThan","Value":4}]}}"""),
      r("""{"Conditions":{"Conditions":[]},"GroupBy":["v"],
           "Aggregation":{"AggregateProperty":"k","AggregateFunction":"Count"}}"""))
    val e = intercept[graft.model.RuleValidator.RuleValidationException](
      RuleSetExecutor.executeAll(df, rules))
    assert(e.getMessage.contains("union-compatible"))
  }

  test("tagAll produces per-rule boolean tags in one scan") {
    val rules = Seq(
      r("""{"Name":"big","Conditions":{"Conditions":[{"Property":"v","Operator":"GreaterThan","Value":4}]}}"""),
      r("""{"Name":"is_b","Conditions":{"Conditions":[{"Property":"k","Operator":"Equal","Value":"b"}]}}"""))
    val tagged = RuleSetExecutor.tagAll(df, rules)
    assert(tagged.columns.toSeq == Seq("k", "v", "big", "is_b", "__matched_any"))
    val rows = tagged.select("k", "big", "is_b", "__matched_any")
      .as[(String, Boolean, Boolean, Boolean)].collect().map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(rows("a") == ((false, false, false)))
    assert(rows("b") == ((true, true, true)))
    assert(rows("c") == ((true, false, true)))
    val scans = tagged.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }
    assert(scans.length == 1)
  }

  test("tagAll: ONE Project node for 100 rules (no per-rule withColumn fold)") {
    val rules = (1 to 100).map(i =>
      r(s"""{"Name":"r$i","Conditions":{"Conditions":[{"Property":"v","Operator":"GreaterThan","Value":$i}]}}"""))
    val tagged = RuleSetExecutor.tagAll(df, rules)
    assert(tagged.columns.length == 2 + 100 + 1)
    def nProjects(d: org.apache.spark.sql.DataFrame) =
      d.queryExecution.analyzed.collect {
        case p: org.apache.spark.sql.catalyst.plans.logical.Project => p
      }.length
    // exactly ONE Project added on top of the input plan, holding all 101 tags
    assert(nProjects(tagged) == nProjects(df) + 1,
      s"expected one added Project, got ${nProjects(tagged) - nProjects(df)}")
  }

  test("tagAll rejects rule names that shadow input columns or each other") {
    val shadow = Seq(
      r("""{"Name":"V","Conditions":{"Conditions":[{"Property":"v","Operator":"GreaterThan","Value":1}]}}"""))
    val e1 = intercept[IllegalArgumentException](RuleSetExecutor.tagAll(df, shadow))
    assert(e1.getMessage.contains("collide"))
    val dup = Seq(
      r("""{"Name":"same","Conditions":{"Conditions":[{"Property":"v","Operator":"GreaterThan","Value":1}]}}"""),
      r("""{"Name":"SAME","Conditions":{"Conditions":[{"Property":"v","Operator":"LessThan","Value":5}]}}"""))
    val e2 = intercept[IllegalArgumentException](RuleSetExecutor.tagAll(df, dup))
    assert(e2.getMessage.contains("duplicate"))
  }

  test("single rule pass-through") {
    val got = RuleSetExecutor.execute(df,
      r("""{"Conditions":{"Conditions":[{"Property":"k","Operator":"Equal","Value":"a"}]}}"""))
      .select("k").as[String].collect().toSeq
    assert(got == Seq("a"))
  }
}
