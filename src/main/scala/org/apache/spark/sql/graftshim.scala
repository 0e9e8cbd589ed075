package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's Catalyst expressions and the public Column API.
  * Spark 4 made Column a ColumnNode wrapper; the classic converters are
  * `private[sql]`, so this shim lives in the sql package.
  */
object GraftColumnShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
