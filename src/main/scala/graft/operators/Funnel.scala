package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Strict-order conversion funnel over an event stream: how many users
  * completed step 1, then step 2 within a horizon of step 1, then step 3
  * within a horizon of step 2, and so on (the standard product-analytics
  * funnel; the scene pipeline's "boundary → metadata → filter" flow in
  * the reference is the same chained-qualification shape over topics —
  * detect_scenes.py:84-118 chains each stage off the previous stage's
  * timestamps).
  *
  * Matching is GREEDY-EARLIEST, the common funnel definition: t1 is the
  * user's earliest step-1 event, and t(k+1) is the earliest step-(k+1)
  * event with `t(k) <= t <= t(k) + horizonUs`. Ties at the same
  * timestamp qualify (inclusive bounds).
  *
  * Scale shape: ONE hash shuffle on the user column. The chained
  * per-step minima are window aggregates over the same partitioning
  * (no ordering needed — whole-partition frames), so Catalyst stacks
  * WindowExecs over a single Exchange; the per-user collapse reuses the
  * same partitioning (zero extra shuffle), and the step summary is a
  * one-row global aggregate unpivoted with `stack` — constant-size
  * driver traffic regardless of input rows.
  */
object Funnel {

  /** Per-user step-completion times: one row per user who reached step 1,
    * with `t_0 .. t_{k-1}` columns (null where the chain stopped).
    */
  def userSteps(events: DataFrame, userCol: String, typeCol: String,
                timeCol: String, steps: Seq[String], horizonUs: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(horizonUs >= 0, s"horizonUs is a magnitude: $horizonUs")
    val w = Window.partitionBy(col(userCol))
    // only the step types participate — pushed to the scan
    var df = events
      .filter(col(typeCol).isin(steps: _*))
      .select(col(userCol), col(typeCol), col(timeCol).cast("long").as("__t"))
    steps.zipWithIndex.foreach { case (s, i) =>
      val cond =
        if (i == 0) col(typeCol) === s
        else col(typeCol) === s &&
          col("__t") >= col(s"__t${i - 1}") &&
          col("__t") <= col(s"__t${i - 1}") + horizonUs
      df = df.withColumn(s"__t$i", min(when(cond, col("__t"))).over(w))
    }
    // collapse to one row per user — the window columns are constant
    // within a user, and the groupBy key matches the window partitioning,
    // so this aggregation adds no shuffle
    val stepAggs = steps.indices.map(i => max(col(s"__t$i")).as(s"step${i + 1}_t"))
    df.groupBy(col(userCol))
      .agg(stepAggs.head, stepAggs.tail: _*)
      .filter(col("step1_t").isNotNull)
  }

  /** Funnel summary: (step_idx, step_name, users_reached, conversion_pct)
    * with conversion measured against step 1.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             timeCol: String, steps: Seq[String], horizonUs: Long): DataFrame = {
    val perUser = userSteps(events, userCol, typeCol, timeCol, steps, horizonUs)
    val countAggs = steps.indices.map(i =>
      sum(when(col(s"step${i + 1}_t").isNotNull, 1L).otherwise(0L)).as(s"__n$i"))
    val counts = perUser.agg(countAggs.head, countAggs.tail: _*)
    // unpivot the one summary row; step names are library-side constants
    // (escaped), not data, so the literal stack expression is safe
    val stackArgs = steps.zipWithIndex.map { case (s, i) =>
      val esc = s.replace("\\", "\\\\").replace("'", "\\'")
      s"${i + 1}L, '$esc', __n$i"
    }.mkString(", ")
    counts
      .selectExpr(s"stack(${steps.length}, $stackArgs) AS (step_idx, step_name, users_reached)",
        "__n0 AS __base")
      .select(col("step_idx"), col("step_name"), col("users_reached"),
        round(col("users_reached") * 100.0 / col("__base"), 4).as("conversion_pct"))
  }
}
