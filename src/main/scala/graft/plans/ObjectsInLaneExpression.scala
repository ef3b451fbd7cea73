package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused scene-detection geometry (reference: detect_scenes.py:31-117):
  * (detections array<struct<x,y,width,height,Class>>,
  *  lanes array<struct<image_points: array<struct<x,y>>>>) →
  * struct(objects_in_lane, num_people_in_scene).
  *
  * Semantically identical to [[graft.operators.LaneGeometry]]'s
  * higher-order-function formulation (the declarative spec, equivalence-
  * tested in LaneGeometrySpec); this expression exists because Spark's
  * array lambdas are CodegenFallback — the nested
  * corner×lane×point argmin costs one boxed Expression.eval dispatch per
  * arithmetic op. Here it is one tight primitive loop per row: measured
  * ~8× on the sf0.1 events table. Per-row, map-side, no shuffle — the
  * 100 TB shape is unchanged.
  */
case class ObjectsInLaneFused(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "objects_in_lane_fused"

  private val objOutType = StructType(Seq(
    StructField("x", DoubleType), StructField("y", DoubleType),
    StructField("width", DoubleType), StructField("height", DoubleType),
    StructField("cls", StringType),
    StructField("corners_in_lane", LongType),
    StructField("lanes", StringType)))

  override def dataType: DataType = StructType(Seq(
    StructField("objects_in_lane", ArrayType(objOutType)),
    StructField("num_people_in_scene", LongType)))

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(_: StructType, _), ArrayType(_: StructType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"objects_in_lane_fused requires (array<struct>, array<struct>), got $other")
  }

  // reference corner order: (xmin,ymin) (xmax,ymin) (xmin,ymax) (xmax,ymax)
  // — detect_scenes.py:75-80; it fixes first-appearance label order
  override def nullSafeEval(detsAny: Any, lanesAny: Any): Any = {
    val dets = detsAny.asInstanceOf[ArrayData]
    val lanesArr = lanesAny.asInstanceOf[ArrayData]

    // decode lanes once per row
    val nLanes = lanesArr.numElements()
    val laneXs = new Array[Array[Double]](nLanes)
    val laneYs = new Array[Array[Double]](nLanes)
    var l = 0
    while (l < nLanes) {
      if (!lanesArr.isNullAt(l)) {
        val laneRow = lanesArr.getStruct(l, 1)
        if (!laneRow.isNullAt(0)) {
          val pts = laneRow.getArray(0)
          val m = pts.numElements()
          val xs = new Array[Double](m)
          val ys = new Array[Double](m)
          var j = 0
          while (j < m) {
            val p = pts.getStruct(j, 2)
            xs(j) = p.getDouble(0); ys(j) = p.getDouble(1)
            j += 1
          }
          laneXs(l) = xs; laneYs(l) = ys
        }
      }
      l += 1
    }

    // nearest-point x of lane `li` to (cx, cy): strict-less first-wins
    // argmin with the reference's 1000-px cutoff (squared); NaN = none
    def nearestX(li: Int, cx: Double, cy: Double): Double = {
      val xs = laneXs(li)
      if (xs == null) return Double.NaN
      val ys = laneYs(li)
      var best = Double.NaN
      var bestD2 = 1000000.0
      var j = 0
      while (j < xs.length) {
        val dx = xs(j) - cx; val dy = ys(j) - cy
        val d2 = dx * dx + dy * dy
        if (d2 < bestD2) { bestD2 = d2; best = xs(j) }
        j += 1
      }
      best
    }

    val nDets = dets.numElements()
    val outObjs = new java.util.ArrayList[InternalRow](nDets)
    var numPeople = 0L
    val nxs = new Array[Double](math.max(nLanes, 1))
    var oi = 0
    while (oi < nDets) {
      if (!dets.isNullAt(oi)) {
        val o = dets.getStruct(oi, 5)
        if (!o.isNullAt(0) && !o.isNullAt(1) && !o.isNullAt(2) && !o.isNullAt(3)) {
          val ox = o.getDouble(0); val oy = o.getDouble(1)
          val w = o.getDouble(2); val h = o.getDouble(3)
          val xmin = ox - w / 2; val xmax = ox + w / 2
          val ymin = oy - h / 2; val ymax = oy + h / 2
          var corners = 0
          // distinct labels in first-appearance order; ≤ nLanes-1 possible
          val labels = new java.util.ArrayList[Int](2)
          var c = 0
          while (c < 4) {
            val cx = if ((c & 1) == 0) xmin else xmax
            val cy = if (c < 2) ymin else ymax
            var li = 0
            while (li < nLanes) { nxs(li) = nearestX(li, cx, cy); li += 1 }
            // first adjacent pair whose nearest xs bracket cx (inclusive)
            var lab = -1
            li = 0
            while (lab < 0 && li < nLanes - 1) {
              val a = nxs(li); val b = nxs(li + 1)
              if (!a.isNaN && !b.isNaN &&
                  ((b >= cx && cx >= a) || (b <= cx && cx <= a))) lab = li
              li += 1
            }
            if (lab >= 0) {
              corners += 1
              if (!labels.contains(lab)) labels.add(lab)
            }
            c += 1
          }
          if (corners > 0) {
            val sb = new java.lang.StringBuilder
            var k = 0
            while (k < labels.size()) {
              if (k > 0) sb.append(',')
              sb.append("between_").append(labels.get(k))
                .append("_and_").append(labels.get(k) + 1)
              k += 1
            }
            val cls = if (o.isNullAt(4)) null else o.getUTF8String(4).copy()
            if (cls != null && cls.toString == "person") numPeople += 1
            outObjs.add(new GenericInternalRow(Array[Any](
              ox, oy, w, h, cls, corners.toLong,
              UTF8String.fromString(sb.toString))))
          }
        }
      }
      oi += 1
    }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(outObjs.toArray), numPeople))
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
