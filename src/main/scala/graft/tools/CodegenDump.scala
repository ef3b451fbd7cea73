package graft.tools

import graft.{GraftSession, SparkEntry}

object CodegenDump {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_range_join_native")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = GraftSession.local(4, "graft-codegen-dump")
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    println(org.apache.spark.sql.execution.debug.codegenString(
      df.queryExecution.executedPlan))
    spark.stop()
  }
}
