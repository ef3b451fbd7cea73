package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  // (user, type, t)
  private def fixture = Seq(
    // u1 completes all three in order
    (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
    // u2: click BEFORE the first view must not qualify; the later one does
    (2L, "click", 5L), (2L, "view", 10L), (2L, "click", 15L),
    // u3: click outside the horizon → stops after step 1
    (3L, "view", 10L), (3L, "click", 500L),
    // u4: never does step 1 → not in the funnel at all
    (4L, "purchase", 10L),
    // u5: tie at the same timestamp qualifies (inclusive lower bound)
    (5L, "view", 10L), (5L, "click", 10L), (5L, "purchase", 10L),
    // u6: greedy-earliest — the purchase BEFORE the matched click does
    // not count, and there is no later one
    (6L, "view", 10L), (6L, "purchase", 12L), (6L, "click", 15L)
  ).toDF("user_id", "event_type", "t")

  private val steps = Seq("view", "click", "purchase")

  test("userSteps chains greedy-earliest times with inclusive bounds") {
    val out = Funnel.userSteps(fixture, "user_id", "event_type", "t", steps, horizonUs = 100L)
      .orderBy("user_id")
      .collect()
      .map(r => (r.getLong(0),
        (if (r.isNullAt(1)) null else r.getLong(1)),
        (if (r.isNullAt(2)) null else r.getLong(2)),
        (if (r.isNullAt(3)) null else r.getLong(3))))
    assert(out === Array(
      (1L, 10L, 20L, 30L),
      (2L, 10L, 15L, null),
      (3L, 10L, null, null),
      (5L, 10L, 10L, 10L),
      (6L, 10L, 15L, null)))
  }

  test("funnel summary counts users per step with conversion vs step 1") {
    val rows = Funnel.funnel(fixture, "user_id", "event_type", "t", steps, horizonUs = 100L)
      .orderBy("step_idx").collect()
    assert(rows === Array(
      Row(1L, "view", 5L, 100.0),
      Row(2L, "click", 4L, 80.0),
      Row(3L, "purchase", 2L, 40.0)))
  }

  test("funnel costs exactly one shuffle for the per-user chain") {
    // the chained window minima, the per-user collapse, and the summary
    // all reuse the one hash exchange on user_id (the summary's
    // single-partition aggregate is driver-sized, not a data shuffle)
    val df = Funnel.userSteps(fixture, "user_id", "event_type", "t", steps, horizonUs = 100L)
    val plan = df.queryExecution.executedPlan.toString
    assert("(?i)\\bExchange hashpartitioning\\b".r.findAllIn(plan).length == 1, plan.take(3000))
  }
}
