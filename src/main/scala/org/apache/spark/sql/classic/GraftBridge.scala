package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway a custom logical operator needs: wrapping a
  * hand-built [[LogicalPlan]] back into a public DataFrame. Everything else in
  * graft.plans lives in graft's own namespace; keeping this accessor minimal
  * and explicit beats reflection. */
object GraftBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)
}
