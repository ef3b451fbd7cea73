package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

import graft.GraftSession

/** Phase-split attribution of the lane-geometry queries' scale-step
  * tail (q_people_count 6.19×, q_obj_in_lane 5.96× at the r14 sf0.1→sf1
  * step — below the 10× data factor, but the two worst non-trivial
  * rows). Cumulative phases, each a standalone plan:
  *
  *   synthesize — simulatedPayloads only (to_json twice per row)
  *   parse      — + get_json_object + from_json of both payloads
  *   fused      — + the objects_in_lane_fused geometry (CodegenFallback
  *                by design — the geometry loop dominates dispatch)
  *   sorted     — + the oracle's terminal global sort
  *
  * Phase deltas at sf0.1 vs sf1 attribute the step: a phase whose delta
  * grows ~10× is linear in rows (fine); >>10× is the superlinear smell.
  *
  * Usage: runMain graft.tools.LaneProbe [sfDir]
  */
object LaneProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-laneprobe")
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(spark)

    def median5(build: () => DataFrame): Double = {
      build().queryExecution.toRdd.count() // warm codegen/JIT
      val runs = (1 to 5).map { _ =>
        val df = build()
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      runs(runs.size / 2)
    }

    val detObj = DataType.fromDDL(
      "array<struct<x:double,y:double,width:double,height:double,Class:string>>")
    val laneArr = DataType.fromDDL(
      "array<struct<image_points:array<struct<x:double,y:double>>>>")
    def pay() = graft.operators.LaneGeometry
      .simulatedPayloads(graft.sources.Tables.events(spark, sfDir))
      .select(col("event_id"), col("detections_raw"), col("lane_points_raw"))
    def parse() = pay().select(col("event_id"),
      size(from_json(get_json_object(col("detections_raw"),
        "$.detections_bboxes_clean"), detObj)).as("nd"),
      size(from_json(get_json_object(col("lane_points_raw"),
        "$.lanes_clean"), laneArr)).as("nl"))
    def fused() = graft.operators.LaneGeometry
      .objectsInLaneFused(pay(), "detections_raw", "lane_points_raw")
      .select(col("event_id"), col("num_people_in_scene"))
    def sorted() = fused().orderBy(col("event_id"))

    val (a, b, c, d) =
      (median5(pay _), median5(parse _), median5(fused _), median5(sorted _))
    println(f"""[laneprobe] {"sf":"$sfDir","synthesize":$a%.3f,"parse":$b%.3f,"fused":$c%.3f,"sorted":$d%.3f}""")
    spark.stop()
  }
}
