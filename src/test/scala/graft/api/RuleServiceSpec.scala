package graft.api

import graft.SparkSpec

class RuleServiceSpec extends SparkSpec {
  import spark.implicits._

  private val users =
    """[{"LoginName":"alice","RegNo":"9","CompanyCode":"C1","IsActive":true},
       {"LoginName":"bob","RegNo":"10","CompanyCode":"C2","IsActive":true},
       {"LoginName":"carol","RegNo":"11","CompanyCode":"C1","IsActive":false}]"""

  test("data-in-request evaluation with inferred schema (reference controller parity)") {
    val got = RuleService.evaluate(spark, users,
      """{"Name":"active-c1","Conditions":{"Conditions":[
           {"Property":"IsActive","Operator":"Equal","Value":true},
           {"Property":"companycode","Operator":"Equal","Value":"C1"}]}}""")
      .select("LoginName").as[String].collect().toSet
    assert(got == Set("alice"))
  }

  test("numeric lift works on inferred string columns") {
    val got = RuleService.evaluate(spark, users,
      """{"Conditions":{"Conditions":[
           {"Property":"RegNo","Operator":"GreaterThan","Value":9}]}}""")
      .select("LoginName").as[String].collect().toSet
    assert(got == Set("bob", "carol"))
  }

  test("multi-rule union distinct and JSON round-trip") {
    val json = RuleService.evaluateToJson(spark, users,
      """{"Conditions":{"Conditions":[
           {"Property":"LoginName","Operator":"StartsWith","Value":"a"}]}}""")
    assert(json.contains("\"alice\"") && !json.contains("\"bob\""))

    val all = RuleService.evaluateAll(spark, users,
      """[{"Conditions":{"Conditions":[
            {"Property":"LoginName","Operator":"Equal","Value":"alice"}]}},
          {"Conditions":{"Conditions":[
            {"Property":"CompanyCode","Operator":"Equal","Value":"C1"}]}}]""")
      .select("LoginName").as[String].collect().toSet
    assert(all == Set("alice", "carol"))
  }

  test("validation error surfaces as an exception (reference maps to HTTP 400)") {
    intercept[graft.model.RuleValidator.RuleValidationException] {
      RuleService.evaluate(spark, users,
        """{"Conditions":{"Conditions":[
             {"Property":"Nope","Operator":"Equal","Value":1}]}}""")
    }
  }
}
