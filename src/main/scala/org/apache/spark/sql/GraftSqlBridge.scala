package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** Bridge into `Dataset.ofRows` (private[sql]) — the standard extension
  * point a Spark-native library uses to wrap a custom [[LogicalPlan]]
  * node as a user-facing DataFrame (the same trick the ecosystem's
  * connector/extension libraries ship). Nothing else from the private
  * surface is touched.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)
}
