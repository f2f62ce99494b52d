package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the round-19 native verify/score kernels to the higher-order
  * function forms they replaced: [[LongDotProduct]] vs
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0L, +)` and
  * [[SigMatchCount]] vs `size(filter(zip_with(a, b, ===), p -> p))` —
  * including the null-element, null-array and length-mismatch edge
  * shapes, so the swap in Similarity.quantizedDot and the Dedup
  * est_jaccard verifies is provably a pure performance change.
  */
class NativeKernelParitySpec extends SparkSpec {
  import spark.implicits._

  private val cases: Seq[(Seq[java.lang.Long], Seq[java.lang.Long])] = Seq(
    (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),                        // plain
    (Seq(-7L, 0L, 9L), Seq(3L, -2L, 11L)),                     // signs
    (Seq(1L, 2L), Seq(1L, 2L, 3L)),                            // len mismatch
    (Seq(1L, null, 3L), Seq(4L, 5L, 6L)),                      // null element
    (Seq.empty[java.lang.Long], Seq.empty[java.lang.Long]),    // empty
    (null, Seq(1L, 2L)))                                       // null array
  // (no overflow case: under ANSI mode — the Spark 4 default — the HOF's
  // x * y THROWS on long overflow where the kernel wraps; both are
  // unreachable for 1e-4-quantized embeddings, whose dots are bounded by
  // ~|x|·|y|·dim ≪ 2⁶³, so the domain where they differ is never hit)

  test("LongDotProduct matches aggregate(zip_with) incl. null shapes") {
    val df = cases.toDF("a", "b")
    val rows = df.select(
        graft.functions.VectorFunctions.longDot(col("a"), col("b")).as("native"),
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")
          .as("hof"))
      .collect()
    rows.zip(cases).foreach { case (r, c) =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"null mismatch on $c: $r")
      if (!r.isNullAt(0)) assert(r.getLong(0) == r.getLong(1), s"value on $c")
    }
  }

  test("SigMatchCount matches size(filter(zip_with)) incl. null shapes") {
    val sigCases: Seq[(Seq[java.lang.Long], Seq[java.lang.Long])] = Seq(
      (Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L, 4L)),              // 3 matches
      (Seq(1L, 2L), Seq(1L, 2L, 5L)),                          // len mismatch
      (Seq(1L, null, 3L), Seq(1L, null, 3L)),                  // null elements
      (Seq.empty[java.lang.Long], Seq(1L)),                    // empty side
      (Seq(5L, 5L, 5L), Seq(5L, 5L, 5L)))                      // all equal
    val df = sigCases.toDF("a", "b")
    val rows = df.select(
        graft.functions.MinHashFunctions.sigMatchCount(col("a"), col("b"))
          .as("native"),
        expr("size(filter(zip_with(a, b, (x, y) -> x = y), p -> p))").as("hof"))
      .collect()
    rows.zip(sigCases).foreach { case (r, c) =>
      assert(r.getInt(0) == r.getInt(1), s"count mismatch on $c: $r")
    }
    // a NULL input array: both forms read NULL (size(NULL) is NULL under
    // the ANSI default; the kernel's nullSafeEval short-circuits), so any
    // `>= threshold` verify filter drops the pair identically
    val nullRow = Seq((null: Seq[java.lang.Long], Seq(1L): Seq[java.lang.Long]))
      .toDF("a", "b")
      .select(
        (graft.functions.MinHashFunctions.sigMatchCount(col("a"), col("b"))
          .cast("double") / 4 >= 0.0).as("nk"),
        (expr("size(filter(zip_with(a, b, (x, y) -> x = y), p -> p))")
          .cast("double") / 4 >= 0.0).as("hk"))
      .head()
    assert(nullRow.isNullAt(0) || !nullRow.getBoolean(0))
    assert(nullRow.isNullAt(1) || !nullRow.getBoolean(1))
  }

  test("labelPropagate is unchanged by the native dot (golden mini-case)") {
    // tiny deterministic propagation: 2 queries, 4 seeds, k=3 — computed
    // against the exact quantized-integer vote by hand
    val seeds = Seq(
      (1L, Seq(1.0f, 0.0f), "a"),
      (2L, Seq(0.9f, 0.1f), "a"),
      (3L, Seq(0.0f, 1.0f), "b"),
      (4L, Seq(0.1f, 0.9f), "b")).toDF("id", "vec", "lab")
    val queries = Seq(
      (10L, Seq(1.0f, 0.05f)),
      (11L, Seq(0.05f, 1.0f))).toDF("id", "vec")
    val out = graft.operators.Similarity
      .labelPropagate(queries, seeds, "id", "vec", "lab", k = 3)
      .orderBy("query_id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((10L, "a", 2L), (11L, "b", 2L)))
  }
}
