package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Spark 4 removed the public Column(expr) constructor (Connect split); the
 * supported conversion lives in sql-private ExpressionUtils. This bridge
 * re-exports it from a sql subpackage — the conventional pattern for
 * libraries that add custom Catalyst expressions.
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager Column -> catalyst conversion. `expression` returns a lazy
    * `ColumnNodeExpression` wrapper — fine when a Dataset operation runs the
    * converter later, but a FunctionRegistry builder (GraftExtensions) must
    * hand the analyzer a plain catalyst tree: the wrapper reports NullType
    * during type checks and cannot codegen. */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
