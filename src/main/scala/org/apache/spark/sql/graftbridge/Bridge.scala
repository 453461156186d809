package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression <-> Column bridge. Spark 4 hides the classic converters
  * behind `private[sql]`; extensions that ship custom Catalyst expressions
  * conventionally expose them via a shim in the sql package. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly convert a Column's node tree into a catalyst expression tree
    * (Unresolved* nodes included, which the analyzer then resolves).
    * `expression` instead wraps the node lazily in a ColumnNodeExpression
    * placeholder — fine inside Dataset plan construction, but opaque (and
    * uncodegen-able) when returned from a FunctionRegistry builder. */
  def resolvableExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
