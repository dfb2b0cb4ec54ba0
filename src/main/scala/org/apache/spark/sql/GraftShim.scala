package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one necessary bridge into Spark's `private[sql]` surface:
  * building a DataFrame from a custom [[LogicalPlan]] node. Every Spark
  * extension library that adds a logical operator needs exactly this
  * hop — `classic.Dataset.ofRows` is package-private to `sql`, so the
  * shim lives in that package and nothing else of graft does. */
object GraftShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column ↔ catalyst Expression bridge (Spark 4 removed the public
    * `Column(expr)` / `Column.expr` surface; `classic.ExpressionUtils`
    * is the sanctioned internal equivalent). Needed to drive catalyst
    * nodes that have no `functions._` wrapper — the runtime-filter
    * Bloom pair in [[graft.scale.Curation.decontamBloom]]. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
