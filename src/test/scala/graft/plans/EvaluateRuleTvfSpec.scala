package graft.plans

import graft.SparkSpec
import graft.functions.GraftFunctions
import graft.model.RuleJson
import graft.rules.RuleEvaluator

class EvaluateRuleTvfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val setup: Unit = {
    GraftFunctions.register(spark)
    Seq(("a", "C1", 100), ("b", "C2", 250), ("c", "C1", 999), ("d", "C3", 42))
      .toDF("name", "company", "bal").createOrReplaceTempView("accounts")
  }

  test("SELECT * FROM evaluate_rule(...) == the library API result") {
    setup
    val json = """{"Conditions":{"Conditions":[
        {"Property":"company","Operator":"Equal","Value":"C1"},
        {"Property":"bal","Operator":"GreaterThan","Value":150}]}}"""
    val viaSql = spark.sql(s"SELECT * FROM evaluate_rule('accounts', '$json')")
      .as[(String, String, Int)].collect().toSet
    val viaApi = RuleEvaluator(spark.table("accounts"), RuleJson.parseRule(json))
      .as[(String, String, Int)].collect().toSet
    assert(viaSql == viaApi && viaSql == Set(("c", "C1", 999)))
  }

  test("aggregating rules work through SQL too (argmax per group)") {
    setup
    val json = """{"Conditions":{"Conditions":[]},"GroupBy":["company"],
        "Aggregation":{"AggregateProperty":"bal","AggregateFunction":"Max"}}"""
    val got = spark.sql(s"SELECT name FROM evaluate_rule('accounts', '$json')")
      .as[String].collect().toSet
    assert(got == Set("c", "b", "d")) // argmax row per company
  }

  test("evaluate_rules = UNION DISTINCT, composable with outer SQL") {
    setup
    val rules = """[
      {"Conditions":{"Conditions":[{"Property":"bal","Operator":"GreaterThan","Value":200}]}},
      {"Conditions":{"Conditions":[{"Property":"company","Operator":"Equal","Value":"C3"}]}}]"""
    val got = spark.sql(
      s"SELECT count(*) AS n FROM evaluate_rules('accounts', '$rules') WHERE bal < 500")
      .as[Long].head()
    assert(got == 2L) // b (250) and d (42); c (999) filtered by the outer WHERE
  }

  test("a bad rule surfaces a clear error at analysis") {
    setup
    val e = intercept[Exception](spark.sql(
      """SELECT * FROM evaluate_rule('accounts',
         '{"Conditions":{"Conditions":[{"Property":"nope","Operator":"Equal","Value":1}]}}')"""))
    assert(e.getMessage.contains("nope"))
  }

  test("the TVF optimizes to the SAME plan shape as the library API") {
    setup
    val json = """{"Conditions":{"Conditions":[
        {"Property":"bal","Operator":"GreaterThan","Value":150}]}}"""
    def shape(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collect { case n => n.nodeName }
    val viaSql = spark.sql(s"SELECT * FROM evaluate_rule('accounts', '$json')")
    val viaApi = RuleEvaluator(spark.table("accounts"), RuleJson.parseRule(json))
    // identical optimization (here: the filter constant-folds straight into
    // the LocalRelation on both paths — full Catalyst treatment, no TVF tax)
    assert(shape(viaSql) == shape(viaApi), s"${shape(viaSql)} vs ${shape(viaApi)}")
  }
}
