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

  test("the optional third TVF argument supplies externalParams (Dynamic*)") {
    setup
    val json = """{"Conditions":{"Conditions":[
        {"Property":"company","Operator":"DynamicEqual","Value":null}]}}"""
    val viaSql = spark.sql(
      s"""SELECT name FROM evaluate_rule('accounts', '$json', '{"company":"C1"}')""")
      .as[String].collect().toSet
    val viaApi = RuleEvaluator(spark.table("accounts"), RuleJson.parseRule(json),
        Map("company" -> "C1"))
      .select("name").as[String].collect().toSet
    assert(viaSql == viaApi && viaSql == Set("a", "c"))
    // evaluate_rules shares the same params object across its rules
    val viaRules = spark.sql(
      s"""SELECT name FROM evaluate_rules('accounts', '[$json]', '{"company":"C3"}')""")
      .as[String].collect().toSet
    assert(viaRules == Set("d"))
  }

  test("a non-object params argument fails with a clear message") {
    setup
    val json = """{"Conditions":{"Conditions":[
        {"Property":"company","Operator":"DynamicEqual","Value":null}]}}"""
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM evaluate_rule('accounts', '$json', '[1,2]')").collect()
    }
    assert(e.getMessage.contains("JSON object"))
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
