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
}
