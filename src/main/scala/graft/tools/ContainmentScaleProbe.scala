package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Dedup

/** Phase attribution for q_containment's post-fix scale residual
  * ([[Dedup.containmentPairs]]): the r16 collision-free sf1 re-run read
  * xlin 2.63 at 500k docs while the sf0.1 scaling curve read 0.25 —
  * conflicting measurements with no owner (the one tail the r16 verdict
  * left unattributed). Same methodology as [[JaccardScaleProbe]]: per
  * scale point (per-replica token bijection, 1e12 id shift so replica
  * ids can NEVER collide with ScaleUp's 1e8 shift), time and count each
  * phase on a fresh execution —
  *
  *   sig      — signature build + materialization (sorted shingle hashes)
  *   postings — rare-shingle inverted index (df agg + join + materialize);
  *              `postings` = its row volume
  *   cand     — candidate self-join through distinct (`candidates` = count)
  *   full     — the whole operator (exact intersect verify included)
  *
  * Timing is ONE fresh execution per phase per point (tail phases run
  * minutes; the signal sought is a superlinear PHASE, not 1.1×).
  *
  * Usage: runMain graft.tools.ContainmentScaleProbe [sfDir] [scalesCsv] [dfCap]
  */
object ContainmentScaleProbe {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def measure(spark: SparkSession, sfDir: String, scales: Seq[Int],
              dfCap: Int): Unit = {
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    scales.foreach { sc =>
      val docs =
        if (sc == 1) base
        else base
          .select(col("*"), explode(expr(s"sequence(0, ${sc - 1})")).as("rep"))
          .select(
            (col("doc_id") + col("rep") * lit(1000000000000L)).as("doc_id"),
            // '~' separator: an 'x'+rep suffix COLLIDES with ScaleUp's
            // own bijection when the input is an sf1 corpus (replica r
            // of ScaleUp-rep-0 text == ScaleUp-rep-r text → exact dup
            // documents, superlinear phantom pairs)
            when(col("rep") === 0, col("text")).otherwise(expr(
              "array_join(transform(split(text, ' '), w -> concat(w, '~', rep)), ' ')"))
              .as("text"))
      val n = docs.count()
      val (sigs, exRare, cand) = Dedup.containmentCandidates(
        docs, "doc_id", "text", shingleN = 3, minContainment = 0.8,
        dfCap = dfCap, sigPath = None)
      val (_, sigSec) = time(sigs.queryExecution.toRdd.count())
      val (nPost, postSec) = time(exRare.queryExecution.toRdd.count())
      val (nCand, candSec) = time(cand.queryExecution.toRdd.count())
      val (nPairs, fullSec) = time(
        Dedup.containmentPairs(docs, "doc_id", "text", shingleN = 3,
          minContainment = 0.8, dfCap = dfCap)
          .queryExecution.toRdd.count())
      graft.runtime.Checkpoints.release()
      println(f"""[contscale] {"docs":$n,"scale":$sc,"dfCap":$dfCap,""" +
        f""""sig_sec":$sigSec%.2f,""" +
        f""""postings":$nPost,"postings_sec":$postSec%.2f,""" +
        f""""candidates":$nCand,"cand_sec":$candSec%.2f,""" +
        f""""pairs":$nPairs,"full_sec":$fullSec%.2f}""")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val scales = args.lift(1).getOrElse("1,3,10")
      .split(",").map(_.trim.toInt).toSeq
    val dfCap = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-contscale")
    spark.sparkContext.setLogLevel("WARN")
    measure(spark, sfDir, scales, dfCap)
    spark.stop()
  }
}
