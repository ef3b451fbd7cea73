package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval analytics over half-open [start, end) spans — the scene/object
  * questions the reference's downstream consumers ask of detected scenes
  * (reference: detect_scenes.py builds per-scene start/end rows; "how many
  * scenes were active at once" / "how much of the drive is covered by at
  * least one scene" are the natural follow-ups).
  *
  * Both operators are ONE shuffle on the group key by construction:
  *
  *  - [[peakConcurrency]] is the classic sweep line: each interval becomes
  *    a +1 delta at start and a −1 delta at end, a per-key running sum
  *    walks the timeline, and the max of that sum is the answer. The
  *    union is map-side; the only exchange is the window's key partition.
  *  - [[coverage]] is gaps-and-islands: a span opens a new island exactly
  *    when it starts after every previous span's end (running max), then
  *    island extents aggregate with NO further exchange — the island
  *    groupBy's clustering keys contain the window's partition keys, so
  *    `HashPartitioning(keys)` already satisfies it (EnsureRequirements
  *    inserts nothing), and the same holds for the final per-key rollup.
  *
  * At 100 TB both scale embarrassingly across keys: no global sort, per-key
  * timelines sort inside their partition, and a hot key is bounded by that
  * key's interval count — the same skew profile (and the same time-sliced
  * remedy, if ever needed) as the as-of family.
  *
  * Half-open semantics pinned by ordering, not convention: at an equal
  * timestamp the −1 sorts before the +1 (`ORDER BY t, delta`), so a span
  * ending at t never overlaps one starting at t — identical in Spark and
  * the DuckDB oracle because both order by the same two columns.
  */
object Intervals {

  /** Max number of simultaneously-open intervals per key, plus the time at
    * which that peak is first reached.
    */
  def peakConcurrency(intervals: DataFrame, keyCols: Seq[String],
                      startCol: String, endCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val starts = intervals.select(keys :+ col(startCol).as("__t") :+ lit(1L).as("__d"): _*)
    val ends   = intervals.select(keys :+ col(endCol).as("__t") :+ lit(-1L).as("__d"): _*)
    val sweep = Window.partitionBy(keys: _*).orderBy(col("__t"), col("__d"))
      .rowsBetween(Window.unboundedPreceding, 0)
    starts.unionAll(ends)
      .withColumn("__open", sum(col("__d")).over(sweep))
      .groupBy(keys: _*)
      .agg(
        max(col("__open")).as("peak_open"),
        // first instant the peak is reached: min t among rows at the max.
        // max of (open, -t) pairs finds max open with SMALLEST t — struct
        // compare is lexicographic in both engines.
        (-max(struct(col("__open"), (-col("__t")).as("__nt"))).getField("__nt"))
          .as("peak_at"))
  }

  /** Union length of a key's spans plus the island (merged-span) count.
    * Touching half-open spans ([a,b) then [b,c)) merge — adjacency adds
    * nothing to covered time either way, and merging is the conventional
    * gaps-and-islands reading of `start > running-max(end)`.
    */
  def coverage(intervals: DataFrame, keyCols: Seq[String],
               startCol: String, endCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val order = Window.partitionBy(keys: _*).orderBy(col(startCol), col(endCol))
    val prevMaxEnd = max(col(endCol)).over(
      order.rowsBetween(Window.unboundedPreceding, -1))
    val islands = intervals
      .withColumn("__new_island",
        when(prevMaxEnd.isNull || col(startCol) > prevMaxEnd, 1L).otherwise(0L))
      .withColumn("__island",
        sum(col("__new_island")).over(order.rowsBetween(Window.unboundedPreceding, 0)))
      // zero-exchange: clustering (keys, __island) ⊇ the window's keys
      .groupBy(keys :+ col("__island"): _*)
      .agg(min(col(startCol)).as("__s"), max(col(endCol)).as("__e"))
    islands
      .groupBy(keys: _*) // zero-exchange again: keys ⊆ (keys, __island)
      .agg(
        count(lit(1)).as("n_islands"),
        sum(col("__e") - col("__s")).as("covered_us"),
        min(col("__s")).as("first_start"),
        max(col("__e")).as("last_end"))
  }
}
