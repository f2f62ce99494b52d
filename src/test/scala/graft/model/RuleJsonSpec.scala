package graft.model

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

class RuleJsonSpec extends AnyFunSuite {

  test("write/parse round-trip preserves every golden rule") {
    val dir = Paths.get("src/test/resources/rules")
    Files.list(dir).iterator().asScala
      .filter(_.toString.endsWith(".json")).foreach { f =>
        val parsed = RuleJson.parseRule(Files.readString(f))
        val roundTripped = RuleJson.parseRule(RuleJson.write(parsed))
        assert(roundTripped == parsed, s"round-trip mismatch for $f")
      }
  }

  test("case-insensitive field names and enum-as-string parse") {
    val r = RuleJson.parseRule(
      """{"name":"x","CONDITIONS":{"logicaloperator":"or","NEGATE":true,
          "conditions":[{"property":"P","OPERATOR":"equal","value":3.5}]},
          "groupby":["a"],"AGGREGATION":{"aggregateproperty":"a","aggregatefunction":"Count"}}""")
    assert(r.name == "x")
    val g = r.conditions.get
    assert(g.logicalOperator == "or" && g.negate)
    assert(g.conditions.head == Condition("P", "equal", RuleValue.Num(BigDecimal("3.5"))))
    assert(r.groupBy == Seq("a"))
    assert(r.aggregation.contains(Aggregation("a", "Count")))
  }

  test("missing Value parses as Null (external-param trigger)") {
    val r = RuleJson.parseRule(
      """{"Conditions":{"Conditions":[{"Property":"p","Operator":"DynamicEqual"}]}}""")
    assert(r.conditions.get.conditions.head.value == RuleValue.Null)
  }

  test("reference-authored metadata round-trips losslessly: CreatedAt, Integration, double Version") {
    val json = """{"Name":"meta","Version":1.5,"IsActive":true,
        "CreatedBy":"ops","CreatedAt":"2024-03-01T12:34:56Z",
        "SourceType":"User","TargetType":"User",
        "Integration":{"CompositeId":"tenant-7:ruleset-3"},
        "Conditions":{"Conditions":[{"Property":"p","Operator":"Equal","Value":1}]}}"""
    val parsed = RuleJson.parseRule(json)
    assert(parsed.version == 1.5)
    assert(parsed.createdAt == "2024-03-01T12:34:56Z")
    assert(parsed.integration.contains(IntegrationBinding(Some("tenant-7:ruleset-3"))))
    val roundTripped = RuleJson.parseRule(RuleJson.write(parsed))
    assert(roundTripped == parsed)
    // the written JSON must carry the fields, not just survive reparse defaults
    val out = RuleJson.write(parsed)
    assert(out.contains("CreatedAt") && out.contains("CompositeId") && out.contains("1.5"))
  }

  test("parseRules reads a rule array") {
    val rs = RuleJson.parseRules("""[{"Name":"a"},{"Name":"b"}]""")
    assert(rs.map(_.name) == Seq("a", "b"))
  }
}
