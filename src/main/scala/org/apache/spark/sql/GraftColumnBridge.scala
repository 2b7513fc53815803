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

  /** DataFrame over a hand-built LogicalPlan (Dataset.ofRows is
    * private[sql]) — the entry point custom logical operators
    * (graft.plans) need. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Expose the private[sql] strategy list an extensions object would
    * inject — lets tests assert wiring without building a new session. */
  def plannerStrategies(ext: SparkSessionExtensions,
      spark: SparkSession): Seq[org.apache.spark.sql.execution.SparkStrategy] =
    ext.buildPlannerStrategies(spark.asInstanceOf[classic.SparkSession])
}
