package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** LaneGeometry: the reference's nested scene-detection geometry
  * (detect_scenes.py:31-117) — known-answer fixture, null propagation,
  * and HOF ≡ fused-native equivalence on real simulated payloads.
  */
class LaneGeometrySpec extends SparkSpec {
  import spark.implicits._

  // lanes: lane0 x=10, lane1 (50,0)/(48,40), lane2 x=90
  private val lanesJson =
    """{"lanes_clean":"[{\"image_points\":[{\"x\":10,\"y\":0}]},{\"image_points\":[{\"x\":50,\"y\":0},{\"x\":48,\"y\":40}]},{\"image_points\":[{\"x\":90,\"y\":0}]}]"}"""
  // object A (person, x=30 w=10): all 4 corners between lanes 0-1;
  // object B (car, x=200): out of lane
  private val detsJson =
    """{"detections_bboxes_clean":"[{\"x\":30,\"y\":0,\"width\":10,\"height\":20,\"Class\":\"person\"},{\"x\":200,\"y\":0,\"width\":4,\"height\":4,\"Class\":\"car\"}]"}"""

  private def fixture = Seq(
    (1L, detsJson, lanesJson),
    (2L, null.asInstanceOf[String], lanesJson) // missing topic → nulls
  ).toDF("id", "det", "lp")

  test("known-answer fixture: in-lane object, labels, people count") {
    for (f <- Seq(LaneGeometry.objectsInLane _, LaneGeometry.objectsInLaneFused _)) {
      val out = f(fixture, "det", "lp").orderBy("id").collect()
      val r1 = out(0)
      val objs = r1.getAs[scala.collection.Seq[Row]]("objects_in_lane")
      assert(objs.length == 1)
      val o = objs.head
      assert(o.getAs[Double]("x") == 30.0 && o.getAs[String]("cls") == "person")
      assert(o.getAs[Long]("corners_in_lane") == 4L)
      assert(o.getAs[String]("lanes") == "between_0_and_1")
      assert(r1.getAs[Long]("num_people_in_scene") == 1L)
      val r2 = out(1)
      assert(r2.isNullAt(r2.fieldIndex("objects_in_lane")))
      assert(r2.isNullAt(r2.fieldIndex("num_people_in_scene")))
    }
  }

  test("edge shapes: empty detections, empty lane list, single lane") {
    val emptyDets = """{"detections_bboxes_clean":"[]"}"""
    val noLanes = """{"lanes_clean":"[]"}"""
    val oneLane = """{"lanes_clean":"[{\"image_points\":[{\"x\":10,\"y\":0}]}]"}"""
    val df = Seq(
      (1L, emptyDets, lanesJson), // no objects → empty array, 0 people
      (2L, detsJson, noLanes),    // no lanes → no bracketing pair → none in lane
      (3L, detsJson, oneLane)     // single lane → no adjacent pair → none in lane
    ).toDF("id", "det", "lp")
    for (f <- Seq(LaneGeometry.objectsInLane _, LaneGeometry.objectsInLaneFused _)) {
      val out = f(df, "det", "lp").orderBy("id").collect()
      out.foreach { r =>
        assert(r.getAs[scala.collection.Seq[Row]]("objects_in_lane").isEmpty)
        assert(r.getAs[Long]("num_people_in_scene") == 0L)
      }
    }
  }

  test("HOF and fused-native agree on simulated payloads (sf0.001)") {
    val sim = LaneGeometry.simulatedPayloads(
      Tables.events(spark, "/root/testdata/sf0.001"))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_id"), to_json(col("objects_in_lane")).as("o"),
        col("num_people_in_scene"))
    val hof = norm(LaneGeometry.objectsInLane(sim, "detections_raw", "lane_points_raw"))
    val fus = norm(LaneGeometry.objectsInLaneFused(sim, "detections_raw", "lane_points_raw"))
    assert(hof.exceptAll(fus).union(fus.exceptAll(hof)).isEmpty)
    // and the simulator produces a non-trivial mix
    val n = LaneGeometry.objectsInLaneFused(sim, "detections_raw", "lane_points_raw")
      .agg(sum(size(col("objects_in_lane"))), sum(col("num_people_in_scene")))
      .head()
    assert(n.getLong(0) > 100 && n.getLong(1) > 10)
  }
}
