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
      val reps = 8
      def batchFrames(spark: SparkSession, salt: Int): Seq[DataFrame] =
        (0 until 3).map(s => frame(spark, 2000, salt * 3 + s)
          .coalesce(1).localCheckpoint())
      def sinkTables(variant: String): Seq[String] =
        (0 until 3).map(s => s"file:$scratchRoot/sink_$variant/store$s")
      val seqTbls = sinkTables("seq")
      val manyTbls = sinkTables("many")
      // warm BOTH variants' tables up front (first-commit costs differ)
      Seq(seqTbls, manyTbls).foreach(tbls =>
        batchFrames(spark, 999).zip(tbls).foreach { case (df, t) =>
          SnapshotStore.append(df, t, statsCols = Seq("id"),
            bloomCols = Seq("id")) })
      def oneRep(variant: String, salt: Int): Double = {
        val tbls = if (variant == "seq") seqTbls else manyTbls
        val dfs = batchFrames(spark, salt)
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
      }
      // ALTERNATE the variant order per rep: a fixed seq-then-many
      // order systematically credits JIT/page-cache warm-up to the
      // second variant; alternation cancels the bias in the medians.
      val (seqTimes, manyTimes) =
        (0 until reps).foldLeft((Vector.empty[Double], Vector.empty[Double])) {
          case ((sq, mn), b) =>
            if (b % 2 == 0) {
              val s = oneRep("seq", b * 2); val m = oneRep("many", b * 2 + 1)
              (sq :+ s, mn :+ m)
            } else {
              val m = oneRep("many", b * 2); val s = oneRep("seq", b * 2 + 1)
              (sq :+ s, mn :+ m)
            }
        }
      def lowerMed(ts: Vector[Double]): Double = {
        val s = ts.sorted; s((s.size - 1) / 2)
      }
      val seqMs = lowerMed(seqTimes)
      val manyMs = lowerMed(manyTimes)
      println(f"""[commitcost-sink] {"stores":3,"rows_per_store":2000,""" +
        f""""reps":$reps,"order":"alternating","seq_ms":$seqMs%.1f,""" +
        f""""appendmany_ms":$manyMs%.1f,"speedup":${seqMs / manyMs}%.2f}""")
    }
    // MAINTENANCE SHAPE (r19 verdict item 4): dedup_sink_maintain
    // compacts 3 fragmented stores one compactClustered at a time.
    // Before building an "overwriteMany", attribute the wall time:
    // data_ms (the clustered rewrite of the same frame to scratch —
    // the floor ANY compaction pays) vs commit overhead (stage + stats
    // + bloom harvest + publish). Coalescing can only overlap the
    // OVERHEAD; if data_ms dominates, the serial loop is already right.
    {
      val frag = 24 // files per store pre-compaction (past any trigger)
      val reps = 3
      val perStore = (0 until 3).map { s =>
        val times = (0 until reps).map { rep =>
          val tbl = s"file:$scratchRoot/maint_s${s}_r$rep/store"
          (0 until frag).foreach(i =>
            SnapshotStore.append(frame(spark, 500, s * 1000 + rep * 100 + i)
              .coalesce(1), tbl, statsCols = Seq("id"), bloomCols = Seq("id")))
          val dataMs = ms {
            SnapshotStore.snapshot(spark, tbl)
              .repartitionByRange(8, col("id"))
              .sortWithinPartitions(col("id"))
              .write.mode("overwrite")
              .parquet(s"$scratchRoot/maint_raw_s${s}_r$rep")
          }
          val compactMs = ms {
            SnapshotStore.compactClustered(spark, tbl, 8, Seq("id"),
              statsCols = Seq("id"), bloomCols = Seq("id"))
            ()
          }
          (dataMs, compactMs)
        }.sortBy(_._2)
        times((times.size - 1) / 2)
      }
      val data = perStore.map(_._1).sum
      val compact = perStore.map(_._2).sum
      val overhead = compact - data
      println(f"""[commitcost-maint] {"stores":3,"files_per_store":$frag,""" +
        f""""reps":$reps,"data_ms":$data%.1f,"compact_ms":$compact%.1f,""" +
        f""""overhead_ms":$overhead%.1f,""" +
        f""""overhead_frac":${overhead / compact}%.2f}""")
    }
    spark.stop()
  }
}
