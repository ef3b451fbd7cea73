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
}
