package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

import graft.functions.Let

/** The reference's scene-detection geometry on its REAL nested data
  * shape (spark_scripts/detect_scenes.py:31-117):
  *
  *  - per-row camera detections arrive as a doubly-JSON-encoded string:
  *    the outer payload holds a `detections_bboxes_clean` field whose
  *    value is itself a JSON string of `[{x, y, width, height, Class}]`
  *    (detect_scenes.py:96 does `json.loads(json.loads(...))`);
  *  - per-row lane-perception output likewise: outer `lanes_clean` is a
  *    JSON string of a list of lanes, each `{image_points: [{x, y}]}`
  *    (detect_scenes.py:33-35);
  *  - per detection, each of the 4 bbox corners finds the nearest image
  *    point of EVERY lane by 2-D euclidean distance (first-wins argmin,
  *    1000-px cutoff — detect_scenes.py:19 `get_nearest_image_point`,
  *    :31 `identify_nearest_lane_point`), then tests whether the corner's
  *    x lies between the nearest points of adjacent lanes i, i+1
  *    (detect_scenes.py:51 `point_in_lane`; y is an open TODO at :59);
  *  - an object is "in lane" when ≥1 corner is; the row output is the
  *    `objects_in_lane` array with `corners_in_lane` + `lanes` labels
  *    added per object (detect_scenes.py:67 `is_object_in_lane`, :93
  *    `obj_in_lane_detection`) and a `num_people_in_scene` count of
  *    in-lane objects with Class='person' (detect_scenes.py:174
  *    `people_in_scenes`).
  *
  * The reference evaluates this as an RDD round-trip through Python
  * dicts, one row at a time on the driver-side serialization path. Here
  * the WHOLE computation is one Catalyst projection: `from_json` twice,
  * then nested higher-order `transform`/`aggregate`/`filter` expressions.
  * No UDF, no RDD, no shuffle — scales with input splits at 100 TB.
  */
object LaneGeometry {

  private val detObjType: DataType =
    DataType.fromDDL("array<struct<x:double,y:double,width:double,height:double,Class:string>>")
  private val laneArrType: DataType =
    DataType.fromDDL("array<struct<image_points:array<struct<x:double,y:double>>>>")

  /** Nearest-point x per lane for corner (cx, cy): 2-D argmin over each
    * lane's image points, strict-less first-wins, 1000-px distance cutoff
    * (squared: 1e6) — exactly detect_scenes.py:19-28. Returns
    * array<double> (null entry when a lane has no point within cutoff).
    */
  private def nearestXPerLane(lanes: Column, cx: Column, cy: Column): Column =
    transform(lanes, lane =>
      aggregate(
        lane.getField("image_points"),
        struct(lit(null).cast("double").as("x"), lit(1000000.0d).as("d2")),
        (acc, p) => {
          val dx = p.getField("x") - cx
          val dy = p.getField("y") - cy
          val d2 = dx * dx + dy * dy
          when(d2 < acc.getField("d2"),
            struct(p.getField("x").as("x"), d2.as("d2")))
            .otherwise(acc)
        }).getField("x"))

  /** First lane index i (0-based) whose adjacent nearest-point pair
    * brackets corner x — `between_nums` is inclusive both ways, so the
    * test is x ∈ [min, max] of the two nearest xs (detect_scenes.py:47,
    * :51-64; the last lane never starts a pair, and the first bracketing
    * pair wins via the short-circuit fold).
    */
  private def cornerLabel(nxs: Column, numLanes: Column, cx: Column): Column =
    // <2 lanes → no adjacent pair, nothing brackets; the guard matters
    // because sequence(0, n−2) counts DOWN for n<2 rather than emptying
    when(numLanes < 2, lit(null).cast("string")).otherwise(aggregate(
      sequence(lit(0L), numLanes.cast("long") - 2L),
      lit(null).cast("string"),
      (acc, i) => {
        val cur = element_at(nxs, (i + 1).cast("int"))
        val nxt = element_at(nxs, (i + 2).cast("int"))
        val between = (nxt >= cx && cx >= cur) || (nxt <= cx && cx <= cur)
        when(acc.isNotNull, acc).otherwise(
          when(between,
            concat(lit("between_"), i.cast("string"), lit("_and_"), (i + 1).cast("string")))
            .otherwise(lit(null).cast("string")))
      }))

  /** Adds `objects_in_lane` (array<struct<x,y,width,height,cls,
    * corners_in_lane,lanes>>) and `num_people_in_scene` from the two raw
    * doubly-encoded JSON columns. Null in either input → null outputs
    * (detect_scenes.py:93 requires both topics present).
    */
  /** Both doubly-encoded payload parses (detect_scenes.py:96, :33-35). */
  private def parsed(detectionsCol: String, lanePointsCol: String): (Column, Column) = (
    from_json(
      get_json_object(col(detectionsCol), "$.detections_bboxes_clean"), detObjType),
    from_json(
      get_json_object(col(lanePointsCol), "$.lanes_clean"), laneArrType))

  def objectsInLane(df: DataFrame, detectionsCol: String,
                    lanePointsCol: String): DataFrame = {
    val (dets, lanes) = parsed(detectionsCol, lanePointsCol)

    // Corner order is the reference's: (xmin,ymin) (xmax,ymin) (xmin,ymax)
    // (xmax,ymax) — it fixes first-appearance order of the lane labels.
    def geo(lanesB: Column): Column => Column = o => {
      val xmin = o.getField("x") - o.getField("width") / 2
      val xmax = o.getField("x") + o.getField("width") / 2
      val ymin = o.getField("y") - o.getField("height") / 2
      val ymax = o.getField("y") + o.getField("height") / 2
      val corners = array(
        struct(xmin.as("cx"), ymin.as("cy")),
        struct(xmax.as("cx"), ymin.as("cy")),
        struct(xmin.as("cx"), ymax.as("cy")),
        struct(xmax.as("cx"), ymax.as("cy")))
      // two-stage transform so each corner's nearest-x array binds ONCE
      // as a lambda value (referencing it inside the bracketing fold
      // would otherwise inline the whole argmin tree per element_at)
      val cornerNxs = transform(corners, c =>
        struct(c.getField("cx").as("cx"),
          nearestXPerLane(lanesB, c.getField("cx"), c.getField("cy")).as("nxs")))
      val labels = transform(cornerNxs, cn =>
        cornerLabel(cn.getField("nxs"), size(lanesB), cn.getField("cx")))
      struct(o.as("o"), filter(labels, l => l.isNotNull).as("ill"))
    }

    // Let.bind the two parsed arrays ONCE per row (a from_json re-inlined
    // per corner would parse the lane JSON 8× per object); bind again for
    // the filtered array so the people count reuses it instead of
    // duplicating the geometry tree
    val packed = Let.bind(struct(dets.as("dets"), lanes.as("lanes"))) { r =>
      val d = r.getField("dets")
      val ln = r.getField("lanes")
      val withLabels = transform(d, geo(ln))
      val objectsAll = transform(withLabels, w => {
        val o = w.getField("o")
        val ill = w.getField("ill")
        struct(
          o.getField("x").as("x"), o.getField("y").as("y"),
          o.getField("width").as("width"), o.getField("height").as("height"),
          o.getField("Class").as("cls"),
          size(ill).cast("long").as("corners_in_lane"),
          array_join(array_distinct(ill), ",").as("lanes"))
      })
      Let.bind(filter(objectsAll, ob => ob.getField("corners_in_lane") > 0)) { objs =>
        struct(
          objs.as("objects_in_lane"),
          size(filter(objs, ob => ob.getField("cls") === "person"))
            .cast("long").as("num_people_in_scene"))
      }
    }

    df.withColumn("__r",
        when(col(detectionsCol).isNotNull && col(lanePointsCol).isNotNull, packed))
      .withColumn("objects_in_lane", col("__r.objects_in_lane"))
      .withColumn("num_people_in_scene", col("__r.num_people_in_scene"))
      .drop("__r")
  }

  /** [[objectsInLane]] via the fused native expression
    * [[graft.plans.ObjectsInLaneFused]] — identical semantics and output
    * schema (equivalence-tested in LaneGeometrySpec), one tight primitive
    * loop per row instead of the interpreted array-lambda tree (~8× at
    * sf0.1). The higher-order version above is the readable declarative
    * spec; this is the production path.
    */
  def objectsInLaneFused(df: DataFrame, detectionsCol: String,
                         lanePointsCol: String): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    val (dets, lanes) = parsed(detectionsCol, lanePointsCol)
    df.withColumn("__r",
        when(col(detectionsCol).isNotNull && col(lanePointsCol).isNotNull,
          call_function("objects_in_lane_fused", dets, lanes)))
      .withColumn("objects_in_lane", col("__r.objects_in_lane"))
      .withColumn("num_people_in_scene", col("__r.num_people_in_scene"))
      .drop("__r")
  }

  /** Deterministic camera/lane payload simulator over the events table —
    * the test stand-in for the reference's `rgb_right_detections_only`
    * and `post_process_lane_points_rgb_front_right` topics. Every value
    * is integer arithmetic on `event_id`, so the DuckDB oracle replicates
    * it exactly; the JSON strings are doubly encoded like the
    * reference's "clean" columns (detect_scenes.py:96, :33). Rows with
    * event_type='view' get null payloads to exercise the
    * missing-topic path (detect_scenes.py:104 else-branch).
    */
  def simulatedPayloads(events: DataFrame, idCol: String = "event_id",
                        typeCol: String = "event_type"): DataFrame = {
    // the testdata parquet is one row group = one input split, so a
    // compute-bound pipeline over it would run single-threaded locally; a
    // real 100 TB table scans as thousands of splits. Emulate that split
    // parallelism (the shuffle moves ~20 B/row of source columns).
    val spread = events.repartition(
      events.sparkSession.sparkContext.defaultParallelism)
    val e = col(idCol)
    val dets = transform(sequence(lit(0L), e % 3L), i => struct(
      ((e * 7L + i * 53L) % 120L).cast("double").as("x"),
      ((e * 13L + i * 29L) % 100L).cast("double").as("y"),
      (lit(4L) + lit(2L) * ((e + i) % 5L)).cast("double").as("width"),
      (lit(6L) + lit(2L) * ((e + i * 3L) % 6L)).cast("double").as("height"),
      when((e + i) % 3L === 0L, "person").otherwise("car").as("Class")))
    val lanes = transform(sequence(lit(0L), lit(2L)), l => struct(
      transform(sequence(lit(0L), lit(4L)), j => struct(
        (lit(40L) * l + lit(2L) * j + e % 5L).cast("double").as("x"),
        (lit(20L) * j + (e + l) % 7L).cast("double").as("y"))).as("image_points")))
    spread
      .withColumn("detections_raw",
        when(col(typeCol) =!= "view",
          to_json(struct(to_json(dets).as("detections_bboxes_clean")))))
      .withColumn("lane_points_raw",
        when(col(typeCol) =!= "view",
          to_json(struct(to_json(lanes).as("lanes_clean")))))
  }
}
