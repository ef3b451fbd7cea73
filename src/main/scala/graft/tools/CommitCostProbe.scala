package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.SnapshotStore

/** Attribution for the snapshot WRITE-path scale-step tail (r17
  * verdict: four sub-second snapshot write keys at 5.8–6.2× across
  * sf0.1→sf1, previously hand-waved as "commit-protocol fixed
  * overheads amortizing"): split one append's wall time into its
  * phases, across DATA SIZE and HISTORY LENGTH independently —
  *
  *   state_ms — commit-log replay (listing + checkpoint + tail
  *              commits): the leg that would betray an O(history)
  *              cost the checkpoint cadence should bound;
  *   write_ms — raw parquet write of the same frame to scratch (the
  *              data-sized floor any engine pays);
  *   append_ms — the full SnapshotStore.append (staging write + stats
  *              harvest + footer reads + rename + publish);
  *   overhead_ms — append - write: what the commit protocol adds.
  *
  * If "fixed overhead amortizing" is true, overhead_ms is ~flat in
  * rows and ~flat in history; a growing state_ms or overhead_ms vs
  * history exposes the leg to bound.
  *
  * Usage: runMain graft.tools.CommitCostProbe [rowsCsv] [historiesCsv]
  */
object CommitCostProbe {

  private def ms(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
  }

  private def frame(spark: SparkSession, rows: Int, salt: Int): DataFrame = {
    import spark.implicits._
    (0 until rows).map(i => (i.toLong + salt.toLong * 10000000L,
      s"v$salt-$i", (i * 31 + salt) % 1000)).toDF("id", "s", "x")
  }

  def main(args: Array[String]): Unit = {
    val rowSizes = args.lift(0).getOrElse("1000,10000,100000")
      .split(",").map(_.trim.toInt).toSeq
    val histories = args.lift(1).getOrElse("0,40,160")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-commitcost")
    spark.sparkContext.setLogLevel("WARN")
    val scratchRoot = java.nio.file.Files
      .createTempDirectory("graft-commitcost").toString
    for (h <- histories; rows <- rowSizes) {
      val tbl = s"file:$scratchRoot/t_h${h}_r$rows"
      // build the history from SMALL commits: history length is the
      // variable, not the table's data volume
      (0 until h).foreach(i =>
        SnapshotStore.append(frame(spark, 16, i).coalesce(1), tbl,
          statsCols = Seq("id")))
      val df = frame(spark, rows, 9999).coalesce(4).localCheckpoint()
      // measure each leg 3x, lower median (fresh-state noise on the
      // first touch of the log dir)
      def med(f: => Unit): Double =
        (1 to 3).map(_ => ms(f)).sorted.apply(1)
      val stateMs =
        if (h == 0) 0.0
        else med { SnapshotStore.state(spark, tbl); () }
      val writeMs = med {
        df.write.mode("overwrite").parquet(s"$scratchRoot/raw_h${h}_r$rows")
      }
      val appendMs = (1 to 3).map { i =>
        ms { SnapshotStore.append(df, tbl, statsCols = Seq("id")); () }
      }.sorted.apply(1)
      println(f"""[commitcost] {"rows":$rows,"history":$h,""" +
        f""""state_ms":$stateMs%.1f,"write_ms":$writeMs%.1f,""" +
        f""""append_ms":$appendMs%.1f,""" +
        f""""overhead_ms":${appendMs - writeMs}%.1f}""")
    }
    // MULTI-STORE SINK SHAPE (the r18 verdict's coalescing follow-up):
    // a containment-sink batch commits 3 stores (sigs/postings/
    // verdicts). Compare the serial 3-append wall time against
    // appendMany's concurrent-staging + ordered-publish form, per
    // batch, lower median over `reps` batches on warm tables.
    {
      val reps = 7
      def batchFrames(spark: SparkSession, salt: Int): Seq[DataFrame] =
        (0 until 3).map(s => frame(spark, 2000, salt * 3 + s)
          .coalesce(1).localCheckpoint())
      def run(variant: String): Double = {
        val root = s"file:$scratchRoot/sink_$variant"
        val tbls = (0 until 3).map(s => s"$root/store$s")
        // warm: seed each table (first-commit costs differ)
        batchFrames(spark, 999).zip(tbls).foreach { case (df, t) =>
          SnapshotStore.append(df, t, statsCols = Seq("id"),
            bloomCols = Seq("id")) }
        val times = (0 until reps).map { b =>
          val dfs = batchFrames(spark, b)
          ms {
            if (variant == "seq")
              dfs.zip(tbls).foreach { case (df, t) =>
                SnapshotStore.append(df, t, statsCols = Seq("id"),
                  bloomCols = Seq("id")) }
            else
              SnapshotStore.appendMany(spark, dfs.zip(tbls).map { case (df, t) =>
                SnapshotStore.AppendPart(df, t, statsCols = Seq("id"),
                  bloomCols = Seq("id")) })
          }
        }.sorted
        times((times.size - 1) / 2)
      }
      val seqMs = run("seq")
      val manyMs = run("many")
      println(f"""[commitcost-sink] {"stores":3,"rows_per_store":2000,""" +
        f""""reps":$reps,"seq_ms":$seqMs%.1f,"appendmany_ms":$manyMs%.1f,""" +
        f""""speedup":${seqMs / manyMs}%.2f}""")
    }
    spark.stop()
  }
}
