package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the sql-package-private Column ↔ Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`). Spark 4 hides the
  * Column(expr) constructor behind the ColumnNode API; custom Catalyst
  * expressions (graft.functions) need exactly this one hop. Keeping the
  * shim in one file bounds our use of non-public Spark API.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
