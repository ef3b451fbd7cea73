package graft.tools

import graft.{GraftSession, SparkEntry}

/** Executes one query and prints its EXECUTED plan (post-AQE) — the
  * plan the static `Explain` output can't show: runtime exchange/stage
  * reuse, AQE join conversions, coalesced partitions.
  *
  * Usage: runMain graft.tools.PlanProbe <queryName> [sfDir]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q1_agg")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = GraftSession.local(8, "graft-plan-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect() // force full execution so AQE finalizes every stage
    val executed = df.queryExecution.executedPlan.toString
    println(s"=== executed plan: $name ===")
    println(executed)
    println(s"=== exchanges: ${"Exchange".r.findAllIn(executed).length}, " +
      s"reused: ${"ReusedExchange|ReusedQueryStage".r.findAllIn(executed).length} ===")
    spark.stop()
  }
}
