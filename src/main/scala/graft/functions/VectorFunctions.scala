package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for cosine similarity over `array<float>`
  * embedding columns.
  *
  * A custom `Expression` with `doGenCode` (not a Scala UDF): it stays inside
  * whole-stage codegen, reads the columnar `ArrayData` without boxing or
  * conversion to Scala collections, and fuses with the surrounding filter /
  * top-k operators. At 100 TB this is the difference between a scan-speed
  * similarity pass and a serialization-bound one.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  // The compute loop reads elements as 4-byte floats straight out of the
  // columnar ArrayData. On an array<double> input (easy to produce by
  // accident — any SQL division or double literal promotes) that would
  // REINTERPRET half of each 8-byte double as a float and silently return
  // garbage similarities; fail analysis loudly instead.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<float> columns, got " +
          s"${left.dataType.sql} and ${right.dataType.sql} — cast the " +
          "embedding to array<float> (element-wise float reads over other " +
          "layouts would silently compute wrong similarities)")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    CosineSimilarity.compute(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CosineSimilarity.compute($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object CosineSimilarity {
  /** Shared by interpreted eval and generated code. */
  def compute(x: ArrayData, y: ArrayData): Double = {
    // fail LOUD on a dimension mismatch (same contract as PqEncodeCodes):
    // truncating to the shorter side would silently score a wrong-dimension
    // vector — the quietly-wrong failure the type check warns against
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"cosine_sim: vector dims differ (${x.numElements()} vs " +
          s"${y.numElements()}) — mixed-dimension corpus or wrong query vector")
    val n = x.numElements()
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      // widen BEFORE multiplying: float*float loses bits vs double math
      val xv = x.getFloat(i).toDouble; val yv = y.getFloat(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 0.0 else dot / denom
  }
}

/** Native 64-bit integer dot product over two `array<tinyint>` columns —
  * the scoring kernel of the int8 ANN tier. The first implementation used
  * `aggregate(zip_with(...))`: higher-order functions are CodegenFallback
  * in Spark (interpreted per element, intermediate array per row), and
  * the byte scan measured 12.9× at a 10× sweep instead of scan-speed —
  * the same lesson as [[CosineSimilarity]], one rung down the ladder.
  * Arithmetic is identical to the HOF form (long-widened products summed
  * in index order), so scores are bit-equal and the battery oracle is
  * untouched.
  */
case class Int8DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "int8_dot"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(ByteType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<tinyint> columns, got " +
          s"${left.dataType.sql} and ${right.dataType.sql} — quantize with " +
          "Similarity.quantizeInt8 first (byte-element reads over other " +
          "layouts would silently compute wrong scores)")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    Int8DotProduct.compute(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Int8DotProduct.compute($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object Int8DotProduct {
  /** Shared by interpreted eval and generated code. */
  def compute(x: ArrayData, y: ArrayData): Long = {
    // fail LOUD on a dimension mismatch (same contract as PqEncodeCodes)
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"int8_dot: vector dims differ (${x.numElements()} vs " +
          s"${y.numElements()}) — mixed-dimension corpus or wrong query vector")
    val n = x.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      s += x.getByte(i).toLong * y.getByte(i).toLong
      i += 1
    }
    s
  }
}

/** Native squared-L2 distance between an `array<float>` vector column and
  * an `array<double>` centroid (typically a literal) — the assignment
  * kernel of the streaming IVF loop. Same CodegenFallback lesson as
  * [[Int8DotProduct]]: the HOF form turned a 500k-vector batch
  * assignment into 32 s of interpreted per-element work at the 10×
  * sweep. Arithmetic identical to the HOF form (widen float→double,
  * diff, square, sum in index order), so cluster assignments are
  * bit-equal.
  */
case class SquaredL2Distance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "squared_l2"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (array<float>, array<double>), got " +
            s"${l.sql} and ${r.sql} — element reads over other layouts " +
            "would silently compute wrong distances")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    SquaredL2Distance.compute(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SquaredL2Distance.compute($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SquaredL2Distance {
  /** Shared by interpreted eval and generated code. */
  def compute(x: ArrayData, y: ArrayData): Double = {
    // fail LOUD on a dimension mismatch: a wrong-dimension vector in the
    // streaming IVF loop would otherwise get a truncated distance and be
    // silently assigned to a wrong cluster (same contract as PqEncodeCodes)
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"sq_l2: vector dims differ (${x.numElements()} vs " +
          s"${y.numElements()}) — mixed-dimension vector or wrong centroid")
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }
}

/** Native product-quantization encoder: an `array<float>` vector to its
  * `m` sub-centroid codes (nearest by squared L2 per contiguous
  * subspace, first minimum wins) in one compiled per-row pass. The HOF
  * formulation (per sub-centroid `aggregate(zip_with(slice(...)))`)
  * walks an interpreted expression tree per ELEMENT per CENTROID —
  * m·k·subDim tree interpretations per row; this expression embeds the
  * codebook via `addReferenceObj` and costs one virtual call per row.
  * Arithmetic is identical (widen float→double, diff² summed in index
  * order, strict-< first-min == `array_position(array_min)` tie-break),
  * so codes are bit-equal and every PQ golden fixture is untouched.
  */
case class PqEncodeCodes(child: Expression, subDim: Int,
                         centroids: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<float>, got ${other.sql} — float-element " +
            "reads over other layouts would silently encode wrong codes")
    }

  override protected def nullSafeEval(input: Any): Any =
    PqEncodeCodes.compute(input.asInstanceOf[ArrayData], subDim, centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCentroids", centroids,
      "double[][][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.PqEncodeCodes.compute($v, $subDim, $cbRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncodeCodes {
  /** Shared by interpreted eval and generated code. */
  def compute(v: ArrayData, subDim: Int,
              centroids: Array[Array[Array[Double]]]): ArrayData = {
    val m = centroids.length
    // fail LOUD on a dimension mismatch: the HOF formulation silently
    // emitted null code elements for short vectors (zip_with padding),
    // which is exactly the quietly-wrong-index failure a build job must
    // never ship; uniform dims are the codebook's fit contract
    if (v.numElements() < m * subDim)
      throw new IllegalArgumentException(
        s"pq_encode: vector has ${v.numElements()} elements, codebook " +
          s"expects ${m * subDim} (m=$m × subDim=$subDim) — mixed-dimension " +
          "corpus or wrong codebook")
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cents = centroids(s)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val diff = v.getFloat(s * subDim + i).toDouble - cent(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c } // strict <: first min wins
        c += 1
      }
      codes(s) = best
      s += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(codes)
  }
}

/** Native 64-bit integer dot product over two `array<bigint>` columns —
  * the scoring kernel of the quantized kNN label-propagation tier
  * ([[graft.operators.Similarity]]'s `quantizedDot`). Same CodegenFallback
  * lesson as [[Int8DotProduct]]: the HOF form
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0L, +)` walks an
  * interpreted expression tree per element and allocates an intermediate
  * array per PAIR — Q·N pairs in the propagation join. NULL semantics
  * mirror the HOF form exactly so scores are bit-equal: a length
  * mismatch (zip_with null-pads the shorter side → null product →
  * absorbing null sum) or any null element yields a NULL dot; otherwise
  * long-widened products sum in index order (wrapping, like the HOF).
  */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "long_dot"
  // the kernel itself introduces nulls (length mismatch / null element),
  // independent of child nullability
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<bigint> columns, got " +
          s"${left.dataType.sql} and ${right.dataType.sql} — quantize to " +
          "long first (long-element reads over other layouts would " +
          "silently compute wrong scores)")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = LongDotProduct.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Long ${ev.value}_r = graft.functions.LongDotProduct.compute($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.longValue(); }
    """)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object LongDotProduct {
  /** Shared by interpreted eval and generated code. Boxed return: null
    * encodes the HOF form's absorbing-null result (length mismatch or a
    * null element), which the expression surfaces as a NULL dot.
    */
  def compute(x: ArrayData, y: ArrayData): java.lang.Long = {
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(s)
  }
}

object VectorFunctions {
  /** Cosine similarity of two `array<float>` columns, as a codegen'd native
    * expression.
    */
  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Product-quantization codes of an `array<float>` column against a
    * fitted codebook, as a codegen'd native expression.
    */
  def pqEncodeCodes(vec: Column, subDim: Int,
                    centroids: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqEncodeCodes(
      ColumnBridge.expression(vec), subDim, centroids))

  /** Squared L2 distance of an `array<float>` column to an `array<double>`
    * centroid, as a codegen'd native expression.
    */
  def l2sq(vec: Column, centroid: Column): Column =
    ColumnBridge.column(SquaredL2Distance(
      ColumnBridge.expression(vec), ColumnBridge.expression(centroid)))

  /** 64-bit integer dot product of two `array<tinyint>` columns, as a
    * codegen'd native expression.
    */
  def int8Dot(a: Column, b: Column): Column =
    ColumnBridge.column(Int8DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** 64-bit integer dot product of two `array<bigint>` columns, as a
    * codegen'd native expression (HOF-equivalent null semantics — see
    * [[LongDotProduct]]).
    */
  def longDot(a: Column, b: Column): Column =
    ColumnBridge.column(LongDotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
