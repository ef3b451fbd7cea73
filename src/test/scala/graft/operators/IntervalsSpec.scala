package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  // (key, start, end) — half-open spans
  private def iv(rows: (String, Long, Long)*) =
    rows.toDF("k", "s", "e")

  test("peakConcurrency counts overlaps; a span ending at t does not overlap one starting at t") {
    val df = iv(
      ("a", 0L, 10L), ("a", 5L, 15L), ("a", 8L, 9L),   // triple overlap at [8,9)
      ("a", 15L, 20L),                                 // touches: ends-first tie rule
      ("b", 0L, 1L), ("b", 1L, 2L))                    // chained, never concurrent
    val out = Intervals.peakConcurrency(df, Seq("k"), "s", "e")
      .orderBy("k").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq(("a", 3L, 8L), ("b", 1L, 0L)))
  }

  test("peak_at is the FIRST instant the peak is reached") {
    val df = iv(("a", 0L, 10L), ("a", 2L, 10L), ("a", 20L, 30L), ("a", 22L, 30L))
    val out = Intervals.peakConcurrency(df, Seq("k"), "s", "e").collect()
    assert(out.head.getLong(1) === 2L)   // peak 2, reached at t=2 and again t=22
    assert(out.head.getLong(2) === 2L)
  }

  test("coverage merges overlapping AND touching spans into islands") {
    val df = iv(
      ("a", 0L, 10L), ("a", 5L, 12L),   // overlap → one island [0,12)
      ("a", 12L, 15L),                  // touching → merges (adjacency adds no gap)
      ("a", 20L, 25L),                  // separate island
      ("b", 0L, 100L), ("b", 10L, 20L)) // contained span changes nothing
    val out = Intervals.coverage(df, Seq("k"), "s", "e")
      .orderBy("k")
      .select("k", "n_islands", "covered_us", "first_start", "last_end").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq ===
      Seq(("a", 2L, 20L, 0L, 25L), ("b", 1L, 100L, 0L, 100L)))
  }

  test("coverage plan pays exactly ONE exchange — the island and rollup aggs reuse the window's partitioning") {
    val df = iv(("a", 0L, 1L)).repartition(4) // break any inherited single-partition luck
    val plan = Intervals.coverage(df, Seq("k"), "s", "e")
      .queryExecution.executedPlan.toString
    // one hashpartitioning exchange for the window; the repartition above
    // is round-robin, not hash — so exactly one hash exchange total
    assert("(?i)Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan.take(3000))
  }

  test("peakConcurrency plan pays exactly ONE hash exchange") {
    val df = iv(("a", 0L, 1L)).repartition(4)
    val plan = Intervals.peakConcurrency(df, Seq("k"), "s", "e")
      .queryExecution.executedPlan.toString
    assert("(?i)Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan.take(3000))
  }
}
