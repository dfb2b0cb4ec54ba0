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
}
