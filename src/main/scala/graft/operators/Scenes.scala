package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scene detection: find [start, end) intervals where a per-group signal
  * is "active", and summarize them (reference:
  * spark_scripts/detect_scenes.py:185 `summarize_person_scenes`).
  *
  * The reference computes the activity signal with a Python UDF and two
  * RDD dict round-trips (detect_scenes.py:116, 186-193); here the state
  * classifier is a native `when` expression and the whole detector is two
  * window functions over the group key — one shuffle, codegen end to end.
  */
object Scenes {

  /** Boundary rows: for each group ordered by time, emit rows where the
    * activity signal crosses zero. `scene_state` is "start" on 0→positive,
    * "end" on positive→0 (reference's `scene_state_udf`,
    * detect_scenes.py:192).
    *
    * @param activity integer column expression: >0 means active.
    */
  def boundaries(df: DataFrame, groupCols: Seq[String], timeCol: String,
                 orderTiebreak: Seq[String], activity: Column): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy((timeCol +: orderTiebreak).map(col): _*)
    df.withColumn("__n", activity.cast("long"))
      .withColumn("__n_lag", lag(col("__n"), 1).over(w))
      .filter(col("__n").isNotNull && col("__n_lag").isNotNull)
      .withColumn("scene_state",
        when(col("__n") > 0 && col("__n_lag") === 0, "start")
          .when(col("__n") === 0 && col("__n_lag") > 0, "end")
          .otherwise(lit(null)))
      .filter(col("scene_state").isNotNull)
      .select((groupCols :+ timeCol).map(col) :+ col("__n").as("activity") :+ col("scene_state"): _*)
  }

  /** Scene summary: pair each "start" boundary with the next boundary's
    * time (reference: detect_scenes.py:205-220 — `lead` over boundary
    * rows, keep starts, derive id/length/topics columns).
    */
  def metadata(boundaryRows: DataFrame, groupCols: Seq[String], timeCol: String,
               sceneName: String, topicsAnalyzed: Seq[String]): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(timeCol))
    boundaryRows
      .withColumn("end_time", lead(col(timeCol), 1).over(w))
      .filter(col("scene_state") === "start")
      .withColumnRenamed(timeCol, "start_time")
      .withColumn("scene_id",
        concat(concat_ws("_", groupCols.map(col): _*),
          lit(s"_${sceneName}_"), col("start_time")))
      .withColumn("scene_length", col("end_time") - col("start_time"))
      .withColumn("topics_analyzed", lit(topicsAnalyzed.mkString(",")))
      .select(groupCols.map(col) ++ Seq(col("start_time"), col("end_time"),
        col("activity").as("activity_at_start"), col("scene_id"),
        col("scene_length"), col("topics_analyzed")): _*)
  }

  /** Scene retrieval: predicate + ranking over scene metadata — the
    * DataFrame re-expression of the reference's DynamoDB scene-metadata
    * query surface (detect_scenes.py:167 `write_results_dynamo`).
    */
  def filterScenes(scenes: DataFrame, minLength: Long, limitN: Int): DataFrame =
    scenes.filter(col("scene_length") >= minLength && col("end_time").isNotNull)
      .orderBy(col("scene_length").desc, col("scene_id"))
      .limit(limitN)
}
