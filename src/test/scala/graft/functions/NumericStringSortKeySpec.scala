package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen

/** Pins the sort key's contract against the expression it replaces:
  * null iff `try_cast(s AS DECIMAL(38,18))` is null, and byte order ==
  * the cast's numeric order — over adversarial numeric-string shapes
  * (signs, exponents, overflow, padding, whitespace, garbage).
  */
class NumericStringSortKeySpec extends SparkSpec {
  import spark.implicits._

  private def key(s: String): Option[Array[Byte]] =
    Option(NumericStringSortKey.compute(UTF8String.fromString(s))).map(_.getBytes)

  private val adversarial = Seq(
    "0", "-0", "0.0", "00", "1", "01", "1.0", "1.00", "10", "9", "-1", "-10", "-9",
    "1.5", "-1.5", "+2", " 3 ", "\t4\n", ".5", "-.5", "5.", "1e3", "-2E-2",
    "1e30", "-1e30", "9" * 20, "-" + "9" * 20, "9" * 21, "1e40", "-1e40",
    "0.000000000000000001", "0.0000000000000000001", // at / below scale 18
    "0.0000000000000000015", // rounds at scale 18
    "", " ", "oops", "1.2.3", "--1", "1-", "NaN", "Infinity", "-Infinity",
    "0x10", "۴" /* non-ASCII digit */, "999999999999999999.999999999999999999")

  test("null exactly when try_cast(DECIMAL(38,18)) is null; order matches the cast") {
    val df = adversarial.toDF("s")
      .select(col("s"), col("s").try_cast("decimal(38,18)").as("d"))
    val rows = df.collect()
    rows.foreach { r =>
      val s = r.getString(0)
      val castNull = r.isNullAt(1)
      assert(key(s).isEmpty == castNull, s"null parity broke for '$s'")
    }
    // pairwise order parity on the parseable subset
    val parseable = rows.filterNot(_.isNullAt(1))
      .map(r => (r.getString(0), r.getDecimal(1)))
    for ((s1, d1) <- parseable; (s2, d2) <- parseable) {
      val byteOrd = java.util.Arrays.compare(key(s1).get, key(s2).get)
      val decOrd = d1.compareTo(d2)
      assert(math.signum(byteOrd) == math.signum(decOrd),
        s"order parity broke for '$s1' vs '$s2'")
    }
  }

  test("property: random numeric-ish strings keep null and order parity") {
    val genNum: Gen[String] = for {
      sign <- Gen.oneOf("", "-", "+")
      intPart <- Gen.choose(0, 22).flatMap(n => Gen.stringOfN(n, Gen.numChar))
      frac <- Gen.oneOf(
        Gen.const(""),
        Gen.choose(1, 21).flatMap(n => Gen.stringOfN(n, Gen.numChar)).map("." + _))
      exp <- Gen.oneOf(Gen.const(""), Gen.choose(-25, 25).map("e" + _))
    } yield s"$sign$intPart$frac$exp"
    val gen = Gen.oneOf(genNum, Gen.asciiPrintableStr)
    val seed = org.scalacheck.rng.Seed(42L)
    val samples = Iterator.iterate((seed, List.empty[String])) { case (sd, acc) =>
      val (s2, v) = (sd.next, gen.apply(Gen.Parameters.default, sd))
      (s2, v.fold(acc)(_ :: acc))
    }.drop(600).next()._2
    // ONE batched cast evaluation for all samples, then pairwise parity
    val casted = samples.toDF("s")
      .select(col("s"), col("s").try_cast("decimal(38,18)").as("d")).collect()
      .map(r => r.getString(0) -> Option(r.getDecimal(1))).toMap
    samples.foreach(s => assert(key(s).isEmpty == casted(s).isEmpty, s"'$s'"))
    val parseable = samples.filter(casted(_).nonEmpty).distinct
    for (s1 <- parseable; s2 <- parseable) {
      val byteOrd = java.util.Arrays.compare(key(s1).get, key(s2).get)
      val decOrd = casted(s1).get.compareTo(casted(s2).get)
      assert(math.signum(byteOrd) == math.signum(decOrd), s"'$s1' vs '$s2'")
    }
  }

  test("argmax over string property unchanged by the sort-key swap (end-to-end)") {
    // "10" must beat "9": numeric, not lexicographic — the original
    // q_argmin_strnum contract through the full rule path
    val df = Seq(("a", "9"), ("a", "10"), ("a", "oops"), ("b", "250"), ("b", "-3"))
      .toDF("g", "qty_str")
    val got = graft.rules.RuleEvaluator(df, graft.model.RuleJson.parseRule(
      """{"Conditions":{"Conditions":[]},
         "GroupBy":["g"],
         "Aggregation":{"AggregateProperty":"qty_str","AggregateFunction":"Max"}}"""))
      .select("g", "qty_str").as[(String, String)].collect().toMap
    assert(got == Map("a" -> "10", "b" -> "250"))
  }
}
