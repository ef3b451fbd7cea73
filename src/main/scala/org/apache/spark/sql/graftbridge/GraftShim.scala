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

  /** A Column evaluating the single value of a one-row subquery plan —
    * the driver runs the subquery at action time and inlines the result
    * (Spark's runtime-filter shape). Lets operators defer driver-side
    * builds (e.g. a bloom bit-set) without collecting at composition.
    */
  def scalarSubquery(plan: LogicalPlan): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(plan))

  /** Drain the listener bus (private[spark]) — lets specs assert
    * deterministically on listener-observed counts (e.g. "composition ran
    * zero jobs") without sleeps.
    */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
