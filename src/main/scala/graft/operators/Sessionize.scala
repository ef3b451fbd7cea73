package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization (batch): the classic two-window formulation —
  * flag rows whose gap from the previous event exceeds the threshold,
  * then a running sum of flags numbers the sessions. One shuffle on the
  * group key; both windows share the same sort. The streaming twin is
  * [[graft.streaming.Streaming.sessionize]].
  */
object Sessionize {

  /** Per-event session index (0-based) per group. */
  def withSessionIndex(events: DataFrame, groupCols: Seq[String], timeCol: String,
                       tiebreak: Seq[String], gapUs: Long): DataFrame = {
    val order = Window.partitionBy(groupCols.map(col): _*)
      .orderBy((timeCol +: tiebreak).map(col): _*)
    events
      .withColumn("__new_session",
        when(col(timeCol) - lag(col(timeCol), 1).over(order) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum(col("__new_session")).over(order.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__new_session")
  }

  /** Session summaries: start/end/duration/count/value per session. */
  def sessions(events: DataFrame, groupCols: Seq[String], timeCol: String,
               tiebreak: Seq[String], gapUs: Long, valueCol: String): DataFrame =
    withSessionIndex(events, groupCols, timeCol, tiebreak, gapUs)
      .groupBy((groupCols :+ "session_idx").map(col): _*)
      .agg(
        min(col(timeCol)).as("session_start"),
        max(col(timeCol)).as("session_end"),
        (max(col(timeCol)) - min(col(timeCol))).as("duration_us"),
        count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 4).as("sum_value"))
}
