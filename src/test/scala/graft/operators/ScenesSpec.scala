package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ScenesSpec extends SparkSpec {
  import spark.implicits._

  // activity: 0 0 1 1 0 1 0 → scenes [3,5) and [6,7)
  private val events = Seq(
    (1L, 1L, 0), (1L, 2L, 0), (1L, 3L, 1), (1L, 4L, 1),
    (1L, 5L, 0), (1L, 6L, 1), (1L, 7L, 0)
  ).toDF("g", "t", "n")

  test("boundaries emits start on 0→positive and end on positive→0") {
    val b = Scenes.boundaries(events, Seq("g"), "t", Seq.empty, col("n"))
      .orderBy("t").collect()
    assert(b.map(r => (r.getAs[Long]("t"), r.getAs[String]("scene_state"))).toSeq ==
      Seq((3L, "start"), (5L, "end"), (6L, "start"), (7L, "end")))
    // first row (t=1) has no lag → excluded, so a leading active row is not a start
  }

  test("metadata pairs each start with the next boundary time") {
    val b = Scenes.boundaries(events, Seq("g"), "t", Seq.empty, col("n"))
    val m = Scenes.metadata(b, Seq("g"), "t", "Burst", Seq("n"))
      .orderBy("start_time").collect()
    assert(m.map(r => (r.getAs[Long]("start_time"), r.getAs[Long]("end_time"),
      r.getAs[Long]("scene_length"))).toSeq == Seq((3L, 5L, 2L), (6L, 7L, 1L)))
    assert(m.head.getAs[String]("scene_id") == "1_Burst_3")
  }

  test("filterScenes applies min length and ranking") {
    val b = Scenes.boundaries(events, Seq("g"), "t", Seq.empty, col("n"))
    val m = Scenes.metadata(b, Seq("g"), "t", "Burst", Seq("n"))
    val f = Scenes.filterScenes(m, minLength = 2L, limitN = 10).collect()
    assert(f.map(_.getAs[Long]("start_time")).toSeq == Seq(3L))
  }
}
