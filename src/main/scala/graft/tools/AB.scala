package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev A/B timer: run the named queries N times alternately in one
  * session (same toRdd methodology as Bench) and print per-run seconds —
  * for isolating a regression Bench's single sample can't resolve.
  *
  * Usage: runMain graft.tools.AB <iters> <sfDir> <query> [query ...]
  */
object AB {
  /** Named raw-operator variants (no final orderBy) for isolating
    * operator cost from the bench queries' output sort.
    */
  private def rawVariants(spark: org.apache.spark.sql.SparkSession,
                          sfDir: String): Map[String, () => org.apache.spark.sql.DataFrame] = {
    import org.apache.spark.sql.functions._
    import graft.operators.{AsOfJoin, Signals}
    def base() = {
      val e = graft.sources.Tables.eventsUs(spark, sfDir)
      val grid = Signals.timeGrid(e.select(col("user_id"), col("ts_us").as("ts")),
        Seq("user_id"), "ts", 3600000000L)
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts_us").as("t"))
        .agg(max(col("value")).as("pval"))
      (grid, purchases)
    }
    Map(
      "raw_asof_window" -> (() => {
        val (g, p) = base()
        AsOfJoin.asOf(g, p, Seq("user_id"), "ts", "t", Seq("pval"))
      }),
      "raw_asof_native" -> (() => {
        val (g, p) = base()
        AsOfJoin.asOfNative(g, p, Seq("user_id"), "ts", "t", Seq("pval"))
      }),
      "ord_asof_window" -> (() => {
        val (g, p) = base()
        AsOfJoin.asOf(g, p, Seq("user_id"), "ts", "t", Seq("pval"))
          .orderBy(col("user_id"), col("ts"))
      }),
      "ord_asof_native" -> (() => {
        val (g, p) = base()
        AsOfJoin.asOfNative(g, p, Seq("user_id"), "ts", "t", Seq("pval"))
          .orderBy(col("user_id"), col("ts"))
      }),
      "ord_asof_native_rep" -> (() => {
        val (g, p) = base()
        AsOfJoin.asOfNative(g.repartition(col("user_id")), p,
          Seq("user_id"), "ts", "t", Seq("pval"))
          .orderBy(col("user_id"), col("ts"))
      }),
      "ord_asof_native_ckpt" -> (() => {
        val (g, p) = base()
        AsOfJoin.asOfNative(g, p, Seq("user_id"), "ts", "t", Seq("pval"))
          .localCheckpoint()
          .orderBy(col("user_id"), col("ts"))
      }))
  }

  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(5)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val names = args.drop(2).toSeq
    // match Bench's parallelism contract so A/B runs reproduce bench
    // conditions (a 4-core-only regression is invisible at 32 cores)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-ab")
    spark.sparkContext.setLogLevel("ERROR")
    sys.env.get("GRAFT_CODEGEN").foreach(v =>
      spark.conf.set("spark.sql.codegen.wholeStage", v))
    spark.range(1000000).selectExpr("sum(id)").collect()
    val raw = rawVariants(spark, sfDir)
    def build(n: String) =
      raw.get(n).map(_.apply()).getOrElse(SparkEntry.queries(n)(spark, sfDir))
    names.foreach(n => build(n).queryExecution.toRdd.count()) // warm
    val times = names.map(_ -> collection.mutable.Buffer.empty[Double]).toMap
    for (_ <- 1 to iters; n <- names) {
      val t0 = System.nanoTime()
      build(n).queryExecution.toRdd.count()
      times(n) += (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n =>
      val ts = times(n).toSeq.sorted
      println(f"[ab] $n%-24s median ${ts(ts.size / 2)}%6.3f s  runs ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }
    if (sys.env.contains("GRAFT_AB_PLAN")) names.foreach { n =>
      val df = build(n)
      df.queryExecution.toRdd.count()
      println(s"=== $n ===\n${df.queryExecution.executedPlan}")
    }
    spark.stop()
  }
}
