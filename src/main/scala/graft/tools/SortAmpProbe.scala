package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.Sort

import graft.{GraftSession, SparkEntry}

/** Measures TERMINAL-SORT amplification per query (guide §1/§2.4): a
  * global `orderBy` plans an `Exchange rangepartitioning` whose
  * RangePartitioner SAMPLES the child — a full extra execution of the
  * query's entire subtree. For each named query this times (median of 3,
  * fresh executions, toRdd like Bench) the declared form vs the same
  * plan with the top-level Sort stripped. `amp` = declared / sortless:
  * ~2.0 means the subtree runs twice and a materialization barrier in
  * front of the sort would halve the query.
  */
object SortAmpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .withExtensions(new graft.plans.GraftExtensions),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_bag_typed", "q_bag_roundtrip", "q_containment")

    def stripSort(df: DataFrame): DataFrame =
      df.queryExecution.analyzed match {
        case Sort(_, true, child, _) =>
          org.apache.spark.sql.graftbridge.GraftShim.ofRows(df.sparkSession, child)
        case _ => df
      }

    def med3(build: () => DataFrame): Double = {
      SparkEntry.clearSharedTables()
      build().queryExecution.toRdd.count() // warm
      graft.runtime.Checkpoints.release()
      val runs = (1 to 3).map { _ =>
        SparkEntry.clearSharedTables()
        val t0 = System.nanoTime()
        build().queryExecution.toRdd.count()
        graft.runtime.Checkpoints.release()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      runs(1)
    }

    names.foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n, sys.error(s"unknown query '$n'"))
      val declared = med3(() => fn(spark, sfDir))
      val sortless = med3(() => stripSort(fn(spark, sfDir)))
      val amp = if (sortless > 0) declared / sortless else -1.0
      println(f"[sortamp] $n%-28s declared=$declared%7.3f s  sortless=$sortless%7.3f s  amp=$amp%5.2f")
    }
    spark.stop()
  }
}
