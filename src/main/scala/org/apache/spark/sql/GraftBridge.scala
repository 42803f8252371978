package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal accessor for the private[sql] Dataset.ofRows — the standard
  * way ecosystem libraries materialize a DataFrame from a custom
  * LogicalPlan (Spark 4 exposes no public constructor for this).
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
