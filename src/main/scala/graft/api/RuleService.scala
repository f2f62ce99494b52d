package graft.api

import graft.model.RuleJson
import graft.rules.{RuleEvaluator, RuleSetExecutor}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's product surface, minus the web server: evaluate a rule
  * against rows carried WITH the request
  * (reference `POST /rules/evaluate`, `RuleController.cs:12-28`, request
  * shape `{Rule, Users}` at `:31-35`).
  *
  * Rows arrive as a JSON array; the schema is inferred from the data — the
  * Spark analogue of the reference reflecting over the element type's
  * properties at call time. Results return as a JSON array string, errors as
  * thrown exceptions for the embedding layer to map to its transport (the
  * reference maps them to HTTP 400 `{Error}`).
  *
  * This entry point targets request-sized payloads (the reference literally
  * POSTs the dataset). Cluster-scale data should enter through
  * `spark.read` + [[graft.rules.RuleEvaluator]] directly.
  */
object RuleService {

  /** Evaluate one rule against a JSON array of rows. */
  def evaluate(spark: SparkSession, rowsJson: String, ruleJson: String,
               externalParams: Map[String, Any] = Map.empty): DataFrame = {
    import spark.implicits._
    val rows = spark.read.json(Seq(rowsJson).toDS())
    RuleEvaluator(rows, RuleJson.parseRule(ruleJson), externalParams)
  }

  /** Evaluate a JSON array of rules: UNION DISTINCT of per-rule results
    * (reference `RuleDefinitionExecutor.Executes`).
    */
  def evaluateAll(spark: SparkSession, rowsJson: String, rulesJson: String,
                  externalParams: Map[String, Any] = Map.empty): DataFrame = {
    import spark.implicits._
    val rows = spark.read.json(Seq(rowsJson).toDS())
    RuleSetExecutor.executeAll(rows, RuleJson.parseRules(rulesJson), externalParams)
  }

  /** End-to-end string → string evaluation (the full request/response
    * round-trip of the reference controller).
    */
  def evaluateToJson(spark: SparkSession, rowsJson: String, ruleJson: String,
                     externalParams: Map[String, Any] = Map.empty): String =
    evaluate(spark, rowsJson, ruleJson, externalParams)
      .toJSON.collect().mkString("[", ",", "]")
}
