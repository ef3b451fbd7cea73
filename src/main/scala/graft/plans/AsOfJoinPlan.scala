package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Whole-operator as-of join: logical node → strategy → physical
  * sort-merge operator.
  *
  * Semantics match [[graft.operators.AsOfJoin.asOf]] (for each left row,
  * the value columns of the latest right row with rightTime <= leftTime
  * within the same key; inclusive), but executed as a single
  * merge pass: both sides hash-partition on the key and sort by
  * (key, time); each partition pair is walked once with O(1) state — the
  * last matching right row. No union, no window buffering, no per-group
  * frame state: strictly less memory than the window formulation and the
  * same single shuffle.
  *
  * Right side must be unique per (key, rightTime); null keys group
  * together (groupBy semantics, like the window formulation).
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    rightValues: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ rightValues.map(_.withNullability(true))

  override protected def withNewChildrenInternal(newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, rv) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, rv) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    rightValues: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ rightValues.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatchedRows" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatchedRows = longMetric("numMatchedRows")
    val leftOut = left.output
    val rightOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val rVals = rightValues
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // separate projections: each UnsafeProjection reuses its buffer
      val lKeyTime = UnsafeProjection.create(lKeys :+ lTime, leftOut)
      val rKeyTime = UnsafeProjection.create(rKeys :+ rTime, rightOut)
      val valProj = UnsafeProjection.create(rVals, rightOut)
      // bind the value side as NULLABLE: unmatched left rows get a null
      // row, and a non-nullable binding would skip the null check
      val resultProj = UnsafeProjection.create(outAttrs,
        leftOut ++ rVals.map(_.withNullability(true)))
      val keyTypes = lKeys.map(_.dataType)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val fullOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes :+ lTime.dataType)
      val nullVals = new GenericInternalRow(rVals.length)
      val joined = new JoinedRow

      val rBuf = rIter.buffered
      // last right row consumed: its (key, time) projection and values
      var lastKeyTime: InternalRow = null
      var lastVals: InternalRow = null

      lIter.map { lRow =>
        val lkt = lKeyTime(lRow)
        // consume right rows while (rKey, rTime) <= (lKey, lTime)
        var continue = rBuf.hasNext
        while (continue) {
          val rkt = rKeyTime(rBuf.head)
          if (fullOrd.compare(rkt, lkt) <= 0) {
            lastKeyTime = rkt.copy()
            lastVals = valProj(rBuf.next()).copy()
            continue = rBuf.hasNext
          } else {
            continue = false
          }
        }
        // match only if the remembered right row shares the left key
        val matched = lastKeyTime != null && keyOrd.compare(lastKeyTime, lkt) == 0
        numOutputRows += 1
        if (matched) numMatchedRows += 1
        resultProj(joined(lRow, if (matched) lastVals else nullVals))
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}
