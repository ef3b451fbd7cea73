package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Dedup

/** Phase attribution for the xlin tail of exact n-gram Jaccard
  * ([[Dedup.ngramJaccardPairs]]): the sf1 bench's scaling section reads
  * xlin ≈ 7–9 at 500k docs (3.4 s → 300 s for 10×) while the sf0.1 run
  * (50k docs) reads 0.23 — this probe finds the knee and the phase that
  * owns it. Per scale point (the bench's own replication: per-replica
  * token bijection, disjoint cross-replica shingles):
  *
  *   sig    — signature build + materialization (sorted shingle hashes)
  *   cand   — prefix self-join through the candidate prune, via
  *            [[Dedup.ngramJaccardCandidates]] (count forces the stage)
  *   full   — the whole operator (candidates + exact verify join)
  *   collisions / candidates / pairs — the volumes that explain them
  *
  * Timing is ONE fresh execution per phase per point (the phases at the
  * tail run minutes — medians are unaffordable and the signal is 10×+,
  * not 1.1×).
  *
  * Usage: runMain graft.tools.JaccardScaleProbe [sfDir] [scalesCsv]
  */
object JaccardScaleProbe {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def measure(spark: SparkSession, sfDir: String, scales: Seq[Int],
              shingleOrder: String, lengthBinned: Boolean): Unit = {
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    scales.foreach { sc =>
      val docs =
        if (sc == 1) base
        else base
          .select(col("*"), explode(expr(s"sequence(0, ${sc - 1})")).as("rep"))
          .select(
            // 1e12 shift: sf1 ids already carry ScaleUp's 1e8 shift — a
            // 1e8 shift here collides ids (two docs under one doc_id)
            (col("doc_id") + col("rep") * lit(1000000000000L)).as("doc_id"),
            // '~' separator: an 'x'+rep suffix COLLIDES with ScaleUp's
            // own bijection when the input is an sf1 corpus (replica r
            // of ScaleUp-rep-0 text == ScaleUp-rep-r text → exact dup
            // documents, superlinear phantom pairs)
            when(col("rep") === 0, col("text")).otherwise(expr(
              "array_join(transform(split(text, ' '), w -> concat(w, '~', rep)), ' ')"))
              .as("text"))
      val n = docs.count()
      val (sigs, cand) = Dedup.ngramJaccardCandidates(
        docs, "doc_id", "text", shingleN = 3, minJaccard = 0.5,
        sigPath = None, shingleOrder = shingleOrder,
        lengthBinned = lengthBinned)
      val (_, sigSec) = time(sigs.queryExecution.toRdd.count())
      val collisions = Dedup.lastCollisionStage.get()
      val (nColl, collSec) = time(collisions.queryExecution.toRdd.count())
      val (nCand, candSec) = time(cand.queryExecution.toRdd.count())
      val fullDf = Dedup.ngramJaccardPairs(docs, "doc_id", "text", shingleN = 3,
        minJaccard = 0.5, shingleOrder = shingleOrder,
        lengthBinned = lengthBinned)
      val (nPairs, fullSec) = time(fullDf.queryExecution.toRdd.count())
      // the EXECUTED join strategies (post-AQE): the verify legs' choice
      // between broadcast (fast, driver-bounded — the r16 OOM hazard
      // class for array-heavy sides AQE under-estimates) and sort-merge
      // (the 100 TB shape) is THE cost cliff between corpora sources
      val plan = fullDf.queryExecution.executedPlan.toString
      def n2(s: String) = s.r.findAllMatchIn(plan).length
      if (sys.env.contains("SPARK_GRAFT_PROBE_PLAN"))
        println(plan.linesIterator
          .filter(l => l.contains("Join") || l.contains("Exchange") ||
            l.contains("Scan") || l.contains("Broadcast"))
          .mkString("[jacscale-plan]\n", "\n", ""))
      graft.runtime.Checkpoints.release()
      println(f"""[jacscale] {"docs":$n,"scale":$sc,""" +
        f""""order":"$shingleOrder","binned":$lengthBinned,""" +
        f""""sig_sec":$sigSec%.2f,""" +
        f""""collisions":$nColl,"collision_sec":$collSec%.2f,""" +
        f""""candidates":$nCand,"cand_sec":$candSec%.2f,""" +
        f""""pairs":$nPairs,"full_sec":$fullSec%.2f,""" +
        f""""smj":${n2("SortMergeJoin")},"bhj":${n2("BroadcastHashJoin")},""" +
        f""""shj":${n2("ShuffledHashJoin")}}""")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val scales = args.lift(1).getOrElse("1,3,10")
      .split(",").map(_.trim.toInt).toSeq
    val order = args.lift(2).getOrElse("hash")
    val binned = args.lift(3).exists(_.toBoolean)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-jacscale")
    spark.sparkContext.setLogLevel("WARN")
    measure(spark, sfDir, scales, order, binned)
    spark.stop()
  }
}
