package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the value columns of the latest
  * right row with `right.time <= left.time` within the same key (inclusive).
  *
  * This generalizes the reference's synchronization semantics
  * (spark_scripts/synchronize_topics.py:170 — grid rows pick up the last
  * earlier signal). Spark has no native as-of join; rather than a range
  * join (which Catalyst would plan as a broadcast-nested-loop or a
  * cartesian within key), this is the union-tag formulation:
  *
  *   union(left tagged 1, right tagged 0)
  *     → window last(ignoreNulls) over (partition key order time, tag)
  *     → keep left rows
  *
  * One shuffle on the key, one local sort — the same cost as a single
  * sort-merge join, independent of time-range density, and AQE-skew-
  * splittable. Right rows sort before left rows at equal times, making the
  * join inclusive.
  *
  * Requirement: the right side must be unique per (keys, rightTime) —
  * pre-aggregate it otherwise; with duplicates "the last one" would be
  * nondeterministic.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String, valueCols: Seq[String]): DataFrame = {
    val t = "__asof_t"
    val src = "__asof_src"
    val leftTagged = left
      .withColumn(t, col(leftTime))
      .withColumn(src, lit(1))
    val rightTagged = right
      .select((keys.map(col) :+ col(rightTime).as(t)) ++ valueCols.map(col): _*)
      .withColumn(src, lit(0))
    val unioned = rightTagged.unionByName(leftTagged, allowMissingColumns = true)
    val filled = Signals.forwardFill(unioned, keys, Seq(t, src), valueCols)
    filled.filter(col(src) === 1).drop(t, src)
  }
}
