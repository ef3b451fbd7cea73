package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geometric primitives for scene detection (reference:
  * spark_scripts/detect_scenes.py:13-90), expressed as native
  * higher-order-function expressions — Catalyst evaluates them inside
  * whole-stage codegen, unlike the reference's per-row Python loops.
  */
object GeoFunctions {

  /** Nearest element of an array to a scalar target: returns
    * struct(val double, idx int, dist double) of the first element
    * minimizing |x - target| (reference: detect_scenes.py:19
    * `get_nearest_image_point` — linear argmin with first-wins ties).
    *
    * `transform` + `aggregate` run as a single codegen'd expression over
    * the array — no explode, no shuffle.
    */
  def nearestPoint(arrCol: String, target: Double): Column = expr(
    s"""aggregate(
       |  transform(`$arrCol`, (v, i) -> named_struct('val', CAST(v AS DOUBLE), 'idx', i)),
       |  named_struct('val', CAST(NULL AS DOUBLE), 'idx', -1, 'dist', CAST('Infinity' AS DOUBLE)),
       |  (acc, x) -> IF(abs(x.val - CAST($target AS DOUBLE)) < acc.dist,
       |                 named_struct('val', x.val, 'idx', x.idx,
       |                              'dist', abs(x.val - CAST($target AS DOUBLE))),
       |                 acc))""".stripMargin)

  /** Lane index of coordinate `xExpr` against sorted boundary positions:
    * first i with boundaries(i) <= x < boundaries(i+1), else -1
    * (reference: detect_scenes.py:51 `point_in_lane` — a point is "in
    * lane" when it falls between two adjacent lane lines).
    */
  def laneIndex(xExpr: String, boundaries: Seq[Double]): Column = {
    val arr = boundaries.mkString("array(", "D,", "D)")
    expr(
      s"""aggregate(sequence(0, ${boundaries.size - 2}), -1,
         |  (acc, i) -> IF(acc >= 0, acc,
         |    IF(element_at($arr, i + 1) <= ($xExpr) AND ($xExpr) < element_at($arr, i + 2), i, acc)))""".stripMargin)
  }

  /** Object-in-lane test: how many bounding-box corners fall inside a
    * lane, and which lanes (reference: detect_scenes.py:67
    * `is_object_in_lane`). Faithful to the reference, the test is
    * x-only (its y handling is an open TODO at detect_scenes.py:59), so
    * the four corners contribute in pairs.
    *
    * Adds `corners_in_lane` (0/2/4) and `lanes`
    * ("between_i_and_j" labels, comma-joined, left-corner first).
    */
  def objectInLane(df: DataFrame, xCol: String, halfWidth: Double,
                   boundaries: Seq[Double]): DataFrame = {
    val li = laneIndex(s"`$xCol` - $halfWidth", boundaries)
    val lj = laneIndex(s"`$xCol` + $halfWidth", boundaries)
    df.withColumn("__li", li).withColumn("__lj", lj)
      .withColumn("corners_in_lane",
        (when(col("__li") >= 0, 2).otherwise(0) +
          when(col("__lj") >= 0, 2).otherwise(0)).cast("long"))
      .withColumn("lanes", concat_ws(",",
        when(col("__li") >= 0,
          concat(lit("between_"), col("__li"), lit("_and_"), col("__li") + 1)),
        when(col("__lj") >= 0 && col("__lj") =!= col("__li"),
          concat(lit("between_"), col("__lj"), lit("_and_"), col("__lj") + 1))))
      .drop("__li", "__lj")
  }
}
