package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass column profiling — the data-quality screen a curation pipeline
  * runs before anything else touches a new corpus drop (null fractions,
  * cardinalities, value ranges per column; the Deequ-style primitive).
  *
  * ONE aggregate over the table computes every metric for every requested
  * column (count/min/max fold map-side; the exact distincts share one
  * Expand-based aggregate — a ×C row expansion on the single scan, which
  * still beats C separate scans and keeps the shuffle bounded by the
  * GROUP's cardinality, here 1). The per-column unpivot happens on the
  * one-row result via `stack`, so it is driver-negligible.
  *
  * min/max are computed in the column's NATURAL order and cast to string
  * afterwards (cast-after-min, not min-of-cast: lexicographic "10" < "9"
  * would silently change integer semantics), which keeps one stable
  * output schema for arbitrary column sets.
  */
object Profile {

  /** `exactDistinct = false` swaps the Expand-based exact distincts for
    * `approx_count_distinct` (HLL++): the aggregate becomes a plain
    * one-pass fold whose exchange carries C sketches instead of every
    * distinct value — the right profile for a 100 TB corpus where
    * "distinct texts" would otherwise shuffle the corpus itself. The
    * oracle pins the exact form; the approx form is the scale path.
    */
  def profile(df: DataFrame, cols: Seq[String],
              exactDistinct: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    def nd(c: String): Column =
      if (exactDistinct) count_distinct(col(c))
      else approx_count_distinct(col(c))
    val aggs: Seq[Column] =
      count(lit(1)).as("__n") +: cols.flatMap { c =>
        Seq(
          count(col(c)).as(s"__nn_$c"),
          nd(c).as(s"__nd_$c"),
          min(col(c)).cast("string").as(s"__min_$c"),
          max(col(c)).cast("string").as(s"__max_$c"))
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the ONE-row aggregate result: explode an inline array of
    // per-column structs (row count is C, driver-negligible)
    val perCol: Seq[Column] = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        (col("__n") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_s"),
        col(s"__max_$c").as("max_s"))
    }
    one.select(explode(array(perCol: _*)).as("__p")).select(col("__p.*"))
  }
}
