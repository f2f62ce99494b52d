package graft.rules

import graft.SparkSpec
import graft.model.{RuleJson, RuleValidator}

class RuleEvaluatorSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    ("g1", "9", 5.0, 1L),
    ("g1", "10", 3.0, 2L),
    ("g2", "7", 3.0, 3L),
    ("g2", "7", 9.0, 4L),
    ("g1", "9", 5.0, 5L)
  ).toDF("grp", "strnum", "value", "id")

  private def rule(json: String) = RuleJson.parseRule(json)

  test("argmax over string aggregate property orders numerically ('10' > '9')") {
    val out = RuleEvaluator(df, rule(
      """{"Conditions":{"Conditions":[]},"GroupBy":["grp"],
         "Aggregation":{"AggregateProperty":"strnum","AggregateFunction":"Max"}}"""))
      .select("grp", "strnum", "id").as[(String, String, Long)].collect().toMap2
    assert(out("g1") == ("10", 2L))
  }

  test("argmin returns the whole row; ties broken by full-row ascending order") {
    val out = RuleEvaluator(df, rule(
      """{"Conditions":{"Conditions":[]},"GroupBy":["grp"],
         "Aggregation":{"AggregateProperty":"value","AggregateFunction":"Min"}}"""))
      .select("grp", "value", "id").as[(String, Double, Long)].collect().toMap2
    assert(out("g1") == (3.0, 2L))
    assert(out("g2") == (3.0, 3L))
  }

  test("argmax ties break by full-row descending order (deterministic)") {
    // g1 rows (strnum=9, value=5.0) exist with id 1 and 5 -> max picks id 5
    val out = RuleEvaluator(df, rule(
      """{"Conditions":{"Conditions":[]},"GroupBy":["grp"],
         "Aggregation":{"AggregateProperty":"value","AggregateFunction":"Max"}}"""))
      .select("grp", "id").as[(String, Long)].collect().toMap
    assert(out("g1") == 5L)
    assert(out("g2") == 4L)
  }

  test("multi-key group Count (legacy engine) and grand aggregate on empty GroupBy") {
    val counts = RuleEvaluator(df, rule(
      """{"Conditions":{"Conditions":[]},"GroupBy":["grp","strnum"],
         "Aggregation":{"AggregateProperty":"id","AggregateFunction":"Count"}}"""))
      .as[(String, String, Long)].collect().toSet
    assert(counts == Set(("g1", "9", 2L), ("g1", "10", 1L), ("g2", "7", 2L)))

    val grand = RuleEvaluator(df, rule(
      """{"Conditions":{"Conditions":[]},"GroupBy":[],
         "Aggregation":{"AggregateProperty":"id","AggregateFunction":"Count"}}"""))
      .as[Long].collect().toSeq
    assert(grand == Seq(5L))

    val globalMin = RuleEvaluator(df, rule(
      """{"Conditions":{"Conditions":[]},"GroupBy":[],
         "Aggregation":{"AggregateProperty":"value","AggregateFunction":"Min"}}"""))
      .select("id").as[Long].collect().toSeq
    assert(globalMin == Seq(2L))
  }

  test("filter composes before aggregation") {
    val out = RuleEvaluator(df, rule(
      """{"Conditions":{"Conditions":[{"Property":"value","Operator":"GreaterThan","Value":4}]},
         "GroupBy":["grp"],
         "Aggregation":{"AggregateProperty":"value","AggregateFunction":"Min"}}"""))
      .select("grp", "id").as[(String, Long)].collect().toMap
    assert(out == Map("g1" -> 1L, "g2" -> 4L))
  }

  test("grand Min over zero matching rows returns an EMPTY result, not an all-null row") {
    val out = RuleEvaluator(df, rule(
      """{"Conditions":{"Conditions":[{"Property":"value","Operator":"GreaterThan","Value":1e12}]},
         "GroupBy":[],
         "Aggregation":{"AggregateProperty":"value","AggregateFunction":"Min"}}"""))
    assert(out.count() == 0L)
  }

  test("Min/Max works when the table has an unorderable (map) column") {
    val withMap = df.withColumn("m",
      org.apache.spark.sql.functions.map(
        org.apache.spark.sql.functions.lit("k"), org.apache.spark.sql.functions.col("id")))
    val out = RuleEvaluator(withMap, rule(
      """{"Conditions":{"Conditions":[]},"GroupBy":["grp"],
         "Aggregation":{"AggregateProperty":"value","AggregateFunction":"Min"}}"""))
      .select("grp", "id").as[(String, Long)].collect().toMap
    assert(out == Map("g1" -> 2L, "g2" -> 3L))
  }

  test("validation: GroupBy without Aggregation / bad aggregate property / bad function") {
    intercept[RuleValidator.RuleValidationException](RuleEvaluator(df, rule(
      """{"Conditions":{"Conditions":[]},"GroupBy":["grp"]}""")))
    intercept[RuleValidator.RuleValidationException](RuleEvaluator(df, rule(
      """{"Conditions":{"Conditions":[]},"GroupBy":["grp"],
         "Aggregation":{"AggregateProperty":"nope","AggregateFunction":"Min"}}""")))
    intercept[RuleValidator.RuleValidationException](RuleEvaluator(df, rule(
      """{"Conditions":{"Conditions":[]},"GroupBy":["grp"],
         "Aggregation":{"AggregateProperty":"value","AggregateFunction":"Median"}}""")))
  }

  private implicit class Tup3Ops[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }
}
