package graft
import org.apache.spark.sql.SparkSession

/** Dev profiler: time named queries N times each at a given SF dir. */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q_dedup_apply")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .withExtensions(new graft.plans.GraftExtensions), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    names.foreach { n =>
      // warm
      SparkEntry.clearSharedTables()
      SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.count()
      graft.runtime.Checkpoints.release()
      val ts = (1 to 3).map { _ =>
        SparkEntry.clearSharedTables()
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.count()
        val sec = (System.nanoTime() - t0) / 1e9
        graft.runtime.Checkpoints.release()
        sec
      }
      println(f"[prof] $n%-24s median=${ts.sorted.apply(1)}%.3f  runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
