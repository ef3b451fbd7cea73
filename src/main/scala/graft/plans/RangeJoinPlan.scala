package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.types.LongType

/** Whole-operator equi-key RANGE (band) join: for each left row, ALL
  * right rows of the same key with
  * `leftTime − lower <= rightTime <= leftTime + upper` (a LEFT join —
  * unmatched left rows keep one null-extended output row).
  *
  * Semantics match [[graft.operators.AsOfJoin.rangeJoin]], but where
  * Catalyst plans the composed form as a sort-merge join with the band
  * as a per-key-group post-filter — O(n_k · m_k) comparisons per key —
  * this exec walks both sorted sides ONCE with a sliding window buffer:
  * O(n + m + output) comparisons, memory bounded by the widest window
  * occupancy (never a whole key group). The as-of join is the
  * "window keeps only the latest row" special case of this operator.
  *
  * Both sides hash-partition on the key and sort by (key, time) — the
  * same single shuffle as the composed form; only the per-partition
  * algorithm changes. Times must be LongType (epoch-micros in graft's
  * data model); use the composed variant for other types.
  *
  * Null semantics (join-condition equality, like the composed form):
  * null keys and null times never match — left rows with them emit
  * null-extended, right rows with them are discarded.
  */
case class RangeJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    lowerUs: Long,
    upperUs: Long,
    rightValues: Seq[Attribute]) extends BinaryNode {

  require(leftTime.dataType == LongType && rightTime.dataType == LongType,
    s"range join times must be LongType, got ${leftTime.dataType}/${rightTime.dataType}")
  require(lowerUs >= 0 && upperUs >= 0,
    s"band bounds are magnitudes: lowerUs=$lowerUs upperUs=$upperUs")

  override def output: Seq[Attribute] =
    left.output ++ (rightTime +: rightValues).map(_.withNullability(true))

  override protected def withNewChildrenInternal(newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

class RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoinNode(l, r, lk, rk, lt, rt, lo, up, rv) =>
      RangeJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, lo, up, rv) :: Nil
    case _ => Nil
  }
}

case class RangeJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    lowerUs: Long,
    upperUs: Long,
    rightValues: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (rightTime +: rightValues).map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatchedRows" -> SQLMetrics.createMetric(sparkContext, "number of matched left rows"),
    "peakWindowRows" -> SQLMetrics.createMetric(sparkContext, "peak window buffer rows"))

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
    val peakWindowRows = longMetric("peakWindowRows")
    val leftOut = left.output
    val rightOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val rVals = rightValues
    val outAttrs = output
    val lower = lowerUs
    val upper = upperUs
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rightOut)
      val lTimeIdx = leftOut.indexWhere(_.exprId == lTime.exprId)
      val rTimeIdx = rightOut.indexWhere(_.exprId == rTime.exprId)
      // the emitted right block is (time, values...): one projection copy
      // per buffered right row, held only while inside the window
      val rEmitProj = UnsafeProjection.create(rTime +: rVals, rightOut)
      val resultProj = UnsafeProjection.create(outAttrs,
        leftOut ++ (rTime +: rVals).map(_.withNullability(true)))
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val nullRight = new GenericInternalRow(rVals.length + 1)
      val joined = new JoinedRow

      val rBuf = rIter.buffered
      var curKey: InternalRow = null          // copied key of the window
      val window = new ArrayBuffer[InternalRow] // (time, values) copies, time-ascending
      var winStart = 0                        // index of first live window row

      def compactWindow(): Unit =
        if (winStart > 64 && winStart * 2 >= window.length) {
          window.remove(0, winStart)
          winStart = 0
        }

      lIter.flatMap { lRow =>
        val lk = lKeyProj(lRow)
        val keyIsNull = lk.anyNull
        val timeIsNull = lRow.isNullAt(lTimeIdx)
        if (keyIsNull || timeIsNull) {
          // equality semantics: never matches; window state untouched
          numOutputRows += 1
          Iterator.single(resultProj(joined(lRow, nullRight)))
        } else {
          val lt = lRow.getLong(lTimeIdx)
          // new key → reset the window
          if (curKey == null || keyOrd.compare(curKey, lk) != 0) {
            curKey = lk.copy()
            window.clear(); winStart = 0
          }
          // pull right rows: discard keys before ours (and null keys /
          // null times), buffer rows of our key with time <= lt + upper
          var continue = rBuf.hasNext
          while (continue) {
            val head = rBuf.head
            val rk = rKeyProj(head)
            if (rk.anyNull || head.isNullAt(rTimeIdx)) { rBuf.next(); continue = rBuf.hasNext }
            else {
              val c = keyOrd.compare(rk, lk)
              if (c < 0) { rBuf.next(); continue = rBuf.hasNext }
              else if (c > 0) continue = false
              else if (head.getLong(rTimeIdx) <= lt + upper) {
                window += rEmitProj(rBuf.next()).copy()
                continue = rBuf.hasNext
              } else continue = false
            }
          }
          // evict rows that fell out of [lt - lower, ...] — left times are
          // ascending within the key, so the start index only advances
          while (winStart < window.length && window(winStart).getLong(0) < lt - lower)
            winStart += 1
          compactWindow()
          if (window.length - winStart > peakWindowRows.value)
            peakWindowRows.set(window.length - winStart)
          if (winStart >= window.length) {
            numOutputRows += 1
            Iterator.single(resultProj(joined(lRow, nullRight)))
          } else {
            numMatchedRows += 1
            // left times can repeat: don't mutate winStart per emit — the
            // next left row re-evicts from the same start
            val from = winStart
            val until = window.length
            numOutputRows += (until - from)
            (from until until).iterator.map { i =>
              resultProj(joined(lRow, window(i)))
            }
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}
