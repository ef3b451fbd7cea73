package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timing: `runMain graft.BenchOne q_a q_b ...`
  * against SPARK_GRAFT_SF_DIR — the iterate-fast loop next to the full
  * [[Bench]]. Same methodology: warmup pass, then median of 3 fresh
  * executions per query via toRdd.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .withExtensions(new graft.plans.GraftExtensions),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val names = if (args.nonEmpty) args.toSeq else Seq("q1_agg")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      fn(spark, sfDir).queryExecution.toRdd.count() // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[benchone] $name median=${runs(1)}%.3f s samples=${runs.map(r => f"$r%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
