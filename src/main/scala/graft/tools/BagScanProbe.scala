package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Phase-split probe for the q_bag_typed_scan shape — attribution tool
  * for its scale-step ratio: the query is write-then-read through REAL
  * bag files, so its step ratio mixes (a) the bench-construction WRITE
  * phase (serialize every event, pack 64 multi-chunk bags across three
  * compressions, write distributed) with (b) the TYPED SCAN phase the
  * store actually exists for (chunk-parallel decode with field
  * pruning). This main times the phases separately at the given SF dir:
  *
  * {{{ runMain graft.tools.BagScanProbe /root/testdata/sf0.1 3 [mix|none|bz2|lz4] }}}
  *
  * prints one line per pass: build+write seconds, read seconds, rows.
  * The third arg A/Bs the chunk compression: `mix` is the historical
  * mod-3 none/bz2/lz4 fixture; a single codec isolates its cost (the
  * r19 verdict's question — how much of the 6.1× scale step is bz2's
  * bytes-linear encode+decode).
  */
object BagScanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(1).map(_.toInt).getOrElse(3)
    val codecMode = args.lift(2).getOrElse("mix")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .withExtensions(new graft.plans.GraftExtensions),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val msgDef = "uint32 user\nuint32 seq\ntime stamp\nfloat64 x\nstring label\n"
    (1 to passes).foreach { p =>
      val dir = "file:" + java.nio.file.Files
        .createTempDirectory("graft-bagprobe").toString
      val ser = graft.sources.Tables.eventsUs(spark, sfDir).select(
        pmod(col("user_id"), lit(64)).as("g"),
        struct(lit("ev").as("topic"), col("ts_us").as("ts_us"),
          graft.sources.Containers.rosSerialize(
            struct(
              col("user_id").as("user"),
              col("event_id").cast("long").as("seq"),
              (col("ts_us") / 1000000L).cast("long").as("stamp.secs"),
              (pmod(col("ts_us"), lit(1000000L)) * 1000L).cast("long").as("stamp.nsecs"),
              col("value").cast("double").as("x"),
              col("event_type").as("label")),
            lit(msgDef)).as("payload")).as("m"))
      val codec =
        if (codecMode == "mix")
          when(pmod(col("g"), lit(3)) === 0, "none")
            .when(pmod(col("g"), lit(3)) === 1, "bz2")
            .otherwise("lz4")
        else lit(codecMode)
      val bags = ser.groupBy(col("g"))
        .agg(graft.sources.Containers.bagPackTyped(
          sort_array(collect_list(col("m"))),
          codec,
          lit(msgDef), messagesPerChunk = 512).as("bag"))
        .select(concat(lit("g"), col("g")).as("bag_file"), col("bag"))
      val t0 = System.nanoTime()
      graft.sources.Containers.writeBags(bags, dir)
      val tWrite = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val rows = graft.sources.Containers.readBagTyped(spark, dir, "ev")
        .select(col("user").as("user_id"), col("ts_us").as("ts"),
          col("seq"), round(col("x"), 4).as("x"), col("label"))
        .orderBy(col("user_id"), col("seq"))
        .queryExecution.toRdd.count()
      val tRead = (System.nanoTime() - t1) / 1e9
      println(f"[bagprobe] pass=$p sf=$sfDir write=$tWrite%.3f read=$tRead%.3f rows=$rows")
    }
    spark.stop()
  }
}
