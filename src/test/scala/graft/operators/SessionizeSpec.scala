package graft.operators

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("sessions split on gaps and summarize correctly") {
    val events = Seq(
      (1L, 0L, 1L, 1.0), (1L, 50L, 2L, 2.0),   // session 0
      (1L, 500L, 3L, 3.0),                     // session 1 (gap 450 > 100)
      (2L, 10L, 4L, 4.0)                       // other user, own session 0
    ).toDF("user_id", "ts", "event_id", "value")
    val out = Sessionize.sessions(events, Seq("user_id"), "ts", Seq("event_id"),
      gapUs = 100L, valueCol = "value")
      .orderBy("user_id", "session_idx").collect()
    assert(out.map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_idx"),
      r.getAs[Long]("session_start"), r.getAs[Long]("session_end"),
      r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSeq == Seq(
      (1L, 0L, 0L, 50L, 2L, 3.0),
      (1L, 1L, 500L, 500L, 1L, 3.0),
      (2L, 0L, 10L, 10L, 1L, 4.0)))
  }

  test("a gap of exactly the threshold does NOT split") {
    val events = Seq((1L, 0L, 1L, 1.0), (1L, 100L, 2L, 1.0))
      .toDF("user_id", "ts", "event_id", "value")
    val out = Sessionize.sessions(events, Seq("user_id"), "ts", Seq("event_id"), 100L, "value")
    assert(out.count() == 1)
  }

  test("native session_window MERGES an exact-gap pair (boundary semantics)") {
    // Empirically verified boundary: Spark merges session windows [t, t+g)
    // when the next window's start EQUALS the current session's end, so two
    // events exactly one gap apart land in the SAME session — matching
    // Sessionize.sessions' `gap > threshold` rule and the q_session_window
    // oracle's strict `>` comparison.
    import org.apache.spark.sql.functions._
    val events = Seq((1L, 0L, 1.0), (1L, 7200000000L, 1.0))
      .toDF("user_id", "ts_us", "value")
    val out = events
      .select(col("user_id"), timestamp_micros(col("ts_us")).as("et"), col("value"))
      .groupBy(col("user_id"), session_window(col("et"), "2 hours"))
      .agg(count(lit(1)).as("n_events"))
    assert(out.count() == 1, "exact 2h gap must merge into one native session window")
    // one microsecond MORE than the gap does split
    val split = Seq((1L, 0L, 1.0), (1L, 7200000001L, 1.0))
      .toDF("user_id", "ts_us", "value")
      .select(col("user_id"), timestamp_micros(col("ts_us")).as("et"), col("value"))
      .groupBy(col("user_id"), session_window(col("et"), "2 hours"))
      .agg(count(lit(1)).as("n_events"))
    assert(split.count() == 2)
  }
}
