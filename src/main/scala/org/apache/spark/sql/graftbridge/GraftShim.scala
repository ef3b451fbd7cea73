package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}

/** Bridge to the sql-package-private Dataset factory, so the library can
  * materialize DataFrames from its own logical plans (e.g.
  * graft.plans.AsOfJoinNode). Same pattern as public Spark extension
  * libraries (Qbeast, Delta): a tiny object inside an
  * `org.apache.spark.sql` subpackage.
  */
object GraftShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSparkSession], plan)
}
