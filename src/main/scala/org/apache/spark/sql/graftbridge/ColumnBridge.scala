package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters.
  *
  * Spark 4.x hides the classic `Column(expr)` constructor behind
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is package-private
  * to `org.apache.spark.sql`; this object lives in that namespace purely to
  * re-export the two converters needed to register custom Catalyst
  * expressions as user-facing `Column` functions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER Column→Expression conversion. `expression` wraps the column's
    * node tree in a lazy `ColumnNodeExpression` that some analyzer paths
    * (e.g. struct-field extraction on a SQL function's result) cannot see
    * through; this converts the node tree to a real Catalyst expression up
    * front. Required for registering Column-composed operators as SQL
    * functions.
    */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** Registers a native expression builder as a session-local SQL function
    * (the runtime alternative to SparkSessionExtensions.injectFunction).
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Registers a table-valued function builder (`FROM fn(...)` SQL surface)
    * — the runtime alternative to SparkSessionExtensions.injectTableFunction.
    */
  def registerTableFunction(
      spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.tableFunctionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
