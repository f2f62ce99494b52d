package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The repo's cross-engine md5 bucket — `conv(substring(md5(s), 1, 8),
  * 16, 10) % width` — as ONE native call: md5 over the UTF-8 bytes,
  * first 4 digest bytes read as an unsigned 32-bit integer, mod width.
  * BIT-IDENTICAL to the SQL chain (the first 8 hex chars ARE the first
  * 4 bytes), so every DuckDB mirror and committed fixture is untouched;
  * what changes is the cost. The SQL chain pays, per call: a
  * `MessageDigest.getInstance` provider lookup inside Spark's `Md5`
  * (commons-codec allocates a fresh digest per row), a 32-char hex
  * encode, a substring copy, and `Conv`'s string→long parse. This
  * expression holds ONE thread-local digest and never materializes hex —
  * the build-side fix for sketch operators that hash every token
  * (measured on `q_cms` at the sf10 sweep: the chain was the row's
  * dominant cost).
  */
case class Md5Bucket(child: org.apache.spark.sql.catalyst.expressions.Expression,
                     width: Long)
    extends UnaryExpression {

  require(width >= 1, "md5_bucket: width must be >= 1")

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_bucket"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects a string column, got ${other.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    Md5Bucket.compute(input.asInstanceOf[UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.Md5Bucket.compute($v, ${width}L);")

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression) =
    copy(child = newChild)
}

object Md5Bucket {

  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String, width: Long): Long = {
    val d = md.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    val v = ((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
      ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)
    v % width
  }

  def column(s: Column, width: Long): Column =
    ColumnBridge.column(Md5Bucket(ColumnBridge.expression(s), width))

  /** The un-bucketed hash itself, in [0, 2³²) — `Sampling.hashLong`'s
    * contract (`conv(substring(md5(key), 1, 8), 16, 10)` as a long) as
    * one native call. `v % 2³²` is the identity on a u32, so this IS
    * [[column]] at the domain width, not a second hash definition.
    */
  def long(s: Column): Column = column(s, 1L << 32)

  /** Shared by interpreted eval and generated code (see [[Md5Hash60]]). */
  def compute60(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    // first 8 digest bytes big-endian, top 60 bits: the hex string is
    // big-endian nibbles, so u64 >>> 4 IS the first-15-hex-chars integer
    var u = 0L
    var i = 0
    while (i < 8) { u = (u << 8) | (digest(i) & 0xffL); i += 1 }
    u >>> 4
  }
}

/** 60-bit md5 prefix: first 15 hex chars of md5(s) as a long in [0, 2⁶⁰)
  * — the wide-domain twin of [[Md5Bucket]] for sketches whose accuracy
  * needs more than the sampler contract's 32 bits (a KMV distinct/overlap
  * sketch over ~10¹¹ keys would collide visibly at 2³²; at 2⁶⁰ expected
  * collisions are ~n²/2⁶¹, invisible next to the sketch's own k-error).
  * 15 chars, not 16: the DuckDB mirror is
  * `CAST(('0x' || substring(md5(s), 1, 15)) AS BIGINT)`, and 16 chars
  * could overflow a signed 64-bit parse.
  */
case class Md5Hash60(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_hash60"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects a string column, got ${other.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    Md5Bucket.compute60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.Md5Bucket.compute60($v);")

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression) =
    copy(child = newChild)
}

object Md5Hash60 {
  def column(s: Column): Column =
    ColumnBridge.column(Md5Hash60(ColumnBridge.expression(s)))
}
