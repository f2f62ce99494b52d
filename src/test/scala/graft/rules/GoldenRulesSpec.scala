package graft.rules

import graft.SparkSpec
import graft.model.RuleJson

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Golden-file corpus (SURVEY §5.5): every checked-in rule JSON must parse,
  * validate against the reference's User shape, and execute; specific rules
  * have pinned expected results.
  */
class GoldenRulesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val users = Seq(
    User("100", "alice", "9", "u1", "Manager", "C1", true),
    User("250", "bob", "10", "u2", "Engineer", "C2", true),
    User("999", "carol", "11", "u3", null, "C1", false),
    User("42x", "dave", "2000", "u4", "Sales Manager", "C3", true),
    User("7", "erin", "1500", "u5", "Senior Manager", "C2", false)
  ).toDF()

  private val dir = Paths.get("src/test/resources/rules")
  private val params = Map[String, Any]("CompanyCode" -> "C2", "LoginName" -> "x")

  test("every golden rule parses, validates and executes") {
    val files = Files.list(dir).iterator().asScala.filter(_.toString.endsWith(".json")).toSeq
    assert(files.nonEmpty)
    files.foreach { f =>
      val rule = RuleJson.parseRule(Files.readString(f))
      val out = RuleEvaluator(users, rule, params)
      out.collect() // must not throw
    }
  }

  private def run(file: String): Set[String] =
    RuleEvaluator(users,
      RuleJson.parseRule(Files.readString(dir.resolve(file))), params)
      .select("LoginName").as[String].collect().toSet

  test("pinned results for representative golden rules") {
    // active AND Title contains Manager AND (C1/C2 OR RegNo>1000)
    assert(run("active_managers.json") == Set("alice", "dave"))
    // C1 must be active: excludes carol
    assert(run("conditional_if.json") == Set("alice", "bob", "dave", "erin"))
    // active AND NOT(C3 OR RegNo<10)
    assert(run("negated_group.json") == Set("bob"))
    // param-driven: CompanyCode == C2
    assert(run("dynamic_params.json") == Set("bob", "erin"))
    // null or empty Title
    assert(run("null_empty_family.json") == Set("carol"))
    // >2 digits AND <1 lowercase letters AND contains '1' -> only "100"
    assert(run("regex_thresholds.json") == Set("alice"))
  }

  test("pinned aggregation results") {
    val maxReg = RuleEvaluator(users,
      RuleJson.parseRule(Files.readString(dir.resolve("max_reg_per_company.json"))), params)
      .select("CompanyCode", "LoginName").as[(String, String)].collect().toMap
    // numeric ordering of string RegNo: C2 -> erin (1500 > 10)
    assert(maxReg == Map("C1" -> "carol", "C2" -> "erin", "C3" -> "dave"))

    val counts = RuleEvaluator(users,
      RuleJson.parseRule(Files.readString(dir.resolve("count_by_company.json"))), params)
      .select("CompanyCode", "IsActive", "count")
      .as[(String, Boolean, Long)].collect().toSet
    assert(counts == Set(("C1", true, 1L), ("C1", false, 1L), ("C2", true, 1L),
      ("C2", false, 1L), ("C3", true, 1L)))
  }
}
