package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark-private Column↔Expression converters (Spark 4 classic).
  * Lives in the org.apache.spark.sql package solely to satisfy the
  * `private[sql]` access on ExpressionUtils; no Spark internals are
  * modified. Used to register graft's Column-composition functions in the
  * SQL function registry without falling back to Scala UDFs (which would
  * break whole-stage codegen).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Eager recursive ColumnNode→Expression conversion. The lazy
    * `ExpressionUtils.expression` wrapper (ColumnNodeExpression) stays
    * Unevaluable when embedded via the FunctionRegistry, so convert fully
    * up front instead.
    */
  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)
}
