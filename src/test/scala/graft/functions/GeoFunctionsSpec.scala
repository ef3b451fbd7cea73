package graft.functions

import graft.SparkSpec

class GeoFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("nearestPoint finds the argmin and keeps the first on ties") {
    val df = Seq((1L, Seq(0.1f, 0.5f, 0.3f, 0.3f))).toDF("id", "arr")
      .withColumn("np", GeoFunctions.nearestPoint("arr", 0.3))
    val r = df.select("np.val", "np.idx", "np.dist").collect().head
    assert(math.abs(r.getDouble(0) - 0.3d) <= 1e-7)
    assert(r.getInt(1) == 2) // first of the two 0.3 elements
    assert(math.abs(r.getDouble(2)) <= 1e-7)
  }

  test("laneIndex is half-open [b_i, b_{i+1})") {
    val df = Seq((0.0, 0), (29.999, 0), (30.0, 1), (189.999, 3), (190.0, -1), (-0.1, -1))
      .toDF("x", "expected")
      .withColumn("lane", GeoFunctions.laneIndex("x", Seq(0, 30, 55, 120, 190)))
    df.collect().foreach { r =>
      assert(r.getAs[Int]("lane") == r.getAs[Int]("expected"), s"x=${r.getAs[Double]("x")}")
    }
  }

  test("objectInLane counts corner pairs and labels lanes") {
    val df = Seq((1L, 28.0), (2L, 200.0), (3L, 40.0)).toDF("id", "x")
    val out = GeoFunctions.objectInLane(df, "x", halfWidth = 5.0,
      boundaries = Seq(0, 30, 55, 120, 190)).orderBy("id").collect()
    // id 1: corners 23 (lane 0) and 33 (lane 1) → 4 corners, two lanes
    assert(out(0).getAs[Long]("corners_in_lane") == 4L)
    assert(out(0).getAs[String]("lanes") == "between_0_and_1,between_1_and_2")
    // id 2: both corners beyond the last boundary → none
    assert(out(1).getAs[Long]("corners_in_lane") == 0L)
    assert(out(1).getAs[String]("lanes") == "")
    // id 3: both corners in lane 1 → one label only
    assert(out(2).getAs[Long]("corners_in_lane") == 4L)
    assert(out(2).getAs[String]("lanes") == "between_1_and_2")
  }
}
