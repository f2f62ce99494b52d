package graft.rules

import graft.SparkSpec
import graft.model.{RuleJson, RuleValidator}

/** Reference sample element type (User.cs:3-12). Top-level: Spark encoders
  * cannot capture classes nested inside a test class.
  */
case class User(NationalIdNumber: String, LoginName: String, RegNo: String,
                Id: String, Title: String, CompanyCode: String, IsActive: Boolean)

/** Per-operator semantics over an in-memory User-shaped table
  * (reference sample type, User.cs:3-12) including nulls, numeric lift on
  * string columns, JSON coercion, and the documented divergences (SURVEY §2.7).
  */
class ConditionCompilerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val users = Seq(
    User("100", "alice", "9", "u1", "Manager", "C1", true),
    User("250", "bob", "10", "u2", "Engineer", "C2", true),
    User("999", "carol", "11", "u3", null, "C1", false),
    User("42", "dave", "2", "u4", "", "C3", true),
    User("7", "erin", "100", "u5", "Senior Manager", "C2", false)
  ).toDF()

  private def run(json: String, params: Map[String, Any] = Map.empty): Set[String] =
    RuleEvaluator(users, RuleJson.parseRule(json), params)
      .select("LoginName").as[String].collect().toSet

  private def cond(prop: String, op: String, value: String): String =
    s"""{"Conditions":{"Conditions":[{"Property":"$prop","Operator":"$op","Value":$value}]}}"""

  test("Equal / NotEqual are null-safe two-valued (C# semantics)") {
    assert(run(cond("Title", "Equal", "\"Manager\"")) == Set("alice"))
    // null Title != "Manager" is TRUE in C#, unlike SQL three-valued logic
    assert(run(cond("Title", "NotEqual", "\"Manager\"")) ==
      Set("bob", "carol", "dave", "erin"))
  }

  test("comparisons with numeric lift on string columns: '9' < '10' numerically") {
    assert(run(cond("RegNo", "GreaterThan", "9")) == Set("bob", "carol", "erin"))
    assert(run(cond("RegNo", "LessThanOrEqual", "\"9\"")) == Set("alice", "dave"))
    assert(run(cond("NationalIdNumber", "LessThan", "50")) == Set("dave", "erin"))
  }

  test("case-insensitive property and operator resolution") {
    assert(run(cond("loginname", "EQUAL", "\"bob\"")) == Set("bob"))
  }

  test("fractional / out-of-range constants against integral columns compare EXACTLY") {
    val nums = Seq((1, "a"), (10, "b"), (11, "c"), (2147483647, "d")).toDF("n", "tag")
    def runN(json: String): Set[String] =
      RuleEvaluator(nums, RuleJson.parseRule(json), Map.empty)
        .select("tag").as[String].collect().toSet
    // 10.6 must NOT truncate to 10 (which would wrongly admit 11 via > 10
    // ... wrongly admit nothing new but change boundaries): > 10.6 admits 11+
    assert(runN(cond("n", "GreaterThan", "10.6")) == Set("c", "d"))
    assert(runN(cond("n", "LessThan", "10.6")) == Set("a", "b"))
    // equality with a fractional constant can never hold for an int column
    assert(runN(cond("n", "Equal", "10.6")) == Set.empty)
    // out-of-range constant must not wrap around Int.MaxValue
    assert(runN(cond("n", "LessThan", "3000000000")) == Set("a", "b", "c", "d"))
    assert(runN(cond("n", "GreaterThan", "3000000000")) == Set.empty)
    // whole in-range constants stay exact-typed (the pushdown-friendly path)
    assert(runN(cond("n", "GreaterThanOrEqual", "11")) == Set("c", "d"))
  }

  test("In / NotIn; NotIn keeps rows with null column (C# equality chain)") {
    assert(run(cond("CompanyCode", "In", """["C1","C3"]""")) ==
      Set("alice", "carol", "dave"))
    assert(run(cond("Title", "NotIn", """["Manager","Engineer"]""")) ==
      Set("carol", "dave", "erin"))
  }

  test("In coerces numeric JSON elements to string columns (superset §2.7.6)") {
    assert(run(cond("RegNo", "In", "[9, 100]")) == Set("alice", "erin"))
  }

  test("string methods are case-sensitive ordinal; null column -> false") {
    assert(run(cond("Title", "Contains", "\"Manager\"")) == Set("alice", "erin"))
    assert(run(cond("Title", "NotContains", "\"Manager\"")) == Set("bob", "dave"))
    assert(run(cond("Title", "StartsWith", "\"Senior\"")) == Set("erin"))
    assert(run(cond("Title", "EndsWith", "\"eer\"")) == Set("bob"))
    assert(run(cond("Title", "Contains", "\"manager\"")) == Set.empty)
  }

  test("Null / NotNull / Empty / NotEmpty / NullOrEmpty / NotNullOrEmpty") {
    assert(run(cond("Title", "Null", "null"), Map("Title" -> "x")) == Set("carol"))
    assert(run(cond("Title", "NotNull", "null"), Map("Title" -> "x")) ==
      Set("alice", "bob", "dave", "erin"))
    assert(run(cond("Title", "Empty", "null"), Map("Title" -> "x")) == Set("carol", "dave"))
    assert(run(cond("Title", "NotEmpty", "null"), Map("Title" -> "x")) ==
      Set("alice", "bob", "erin"))
    assert(run(cond("Title", "NullOrEmpty", "null"), Map("Title" -> "x")) ==
      Set("carol", "dave"))
    // reference :210-216 is a tautology; we implement the intended AND
    assert(run(cond("Title", "NotNullOrEmpty", "null"), Map("Title" -> "x")) ==
      Set("alice", "bob", "erin"))
  }

  test("boolean Equal with JSON bool") {
    assert(run(cond("IsActive", "Equal", "true")) == Set("alice", "bob", "dave"))
  }

  test("regex-count family; string Threshold; Required is case-insensitive") {
    // NationalIdNumber with >2 digit chars: 100, 250, 999
    assert(run(cond("NationalIdNumber", "ContainIfCountIsGreater",
      """{"Target":"[0-9]","Threshold":"2"}""")) == Set("alice", "bob", "carol"))
    assert(run(cond("NationalIdNumber", "ContainIfCountIsLess",
      """{"Target":"[0-9]","Threshold":2}""")) == Set("erin"))
    assert(run(cond("Title", "MustContainIfCountIsGreater",
      """{"Target":"[a-z]","Required":"MANAGER","Threshold":"5"}""")) ==
      Set("alice", "erin"))
  }

  test("If compiles to material implication (check ? then : true)") {
    val j =
      """{"Conditions":{"Conditions":[{"Property":"CompanyCode","Operator":"If",
           "Value":{"Check":{"Property":"CompanyCode","Operator":"Equal","Value":"C1"},
                    "Then":{"Property":"IsActive","Operator":"Equal","Value":true}}}]}}"""
    assert(run(j) == Set("alice", "bob", "dave", "erin")) // carol: C1 but inactive
  }

  test("Dynamic* family resolves external params; emptiness tests the CONSTANT") {
    assert(run(cond("CompanyCode", "DynamicEqual", "null"),
      Map("CompanyCode" -> "C2")) == Set("bob", "erin"))
    assert(run(cond("CompanyCode", "DynamicNullOrEmpty", "null"),
      Map("CompanyCode" -> "  ")) == Set("alice", "bob", "carol", "dave", "erin"))
    assert(run(cond("CompanyCode", "DynamicNotNullOrEmpty", "null"),
      Map("CompanyCode" -> "x")) == Set("alice", "bob", "carol", "dave", "erin"))
    assert(run(cond("CompanyCode", "DynamicEmpty", "null"),
      Map("CompanyCode" -> "x")) == Set.empty)
  }

  test("missing external param throws; unknown operator throws; unknown property throws") {
    intercept[IllegalArgumentException](run(cond("CompanyCode", "DynamicEqual", "null")))
    intercept[IllegalArgumentException](run(cond("CompanyCode", "Frobnicate", "1")))
    intercept[RuleValidator.RuleValidationException](run(cond("Nope", "Equal", "1")))
  }

  test("AND/OR/Negate group fold; empty group is TRUE") {
    val j =
      """{"Conditions":{"LogicalOperator":"AND",
           "Conditions":[{"Property":"IsActive","Operator":"Equal","Value":true}],
           "Groups":[{"LogicalOperator":"OR","Negate":true,"Conditions":[
             {"Property":"CompanyCode","Operator":"Equal","Value":"C1"},
             {"Property":"RegNo","Operator":"GreaterThan","Value":50}]}]}}"""
    assert(run(j) == Set("bob", "dave")) // active AND NOT(C1 OR RegNo>50)
    assert(run("""{"Conditions":{"Conditions":[]}}""") ==
      Set("alice", "bob", "carol", "dave", "erin"))
  }

  test("unparseable numeric strings compare false (cast-to-null divergence §2.7.1)") {
    val mixed = Seq(("a", "12"), ("b", "oops"), ("c", "3")).toDF("k", "v")
    val got = RuleEvaluator(mixed, RuleJson.parseRule(
      """{"Conditions":{"Conditions":[{"Property":"v","Operator":"GreaterThan","Value":2}]}}"""))
      .select("k").as[String].collect().toSet
    assert(got == Set("a", "c"))
  }
}
