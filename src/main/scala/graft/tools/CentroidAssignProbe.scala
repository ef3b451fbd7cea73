package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Similarity
import graft.sources.Tables

/** Phase attribution for CORPUS-SCALED centroid assignment — the r16
  * verdict's `weak` ×2: with k derived from the corpus (k = n/256 for
  * SemDeDup clustering, k = √n for IVF), `ivfTrain`'s brute-force
  * broadcast argmax scores every row against ALL k centroids, making
  * assignment n²/256 resp. n^1.5 work. `ivfTrainScaled` bounds both
  * legs (hash-sampled training + two-level ANN assignment); this probe
  * measures exactly the quantity that changed — the CENTROID-CANDIDATE
  * volume each assignment must score — plus wall time per phase, the
  * EmbedPairsProbe methodology applied to the assignment leg.
  *
  *   train_sec   — full train wall (sampled Lloyd pass for `scaled`,
  *                 ivfTrain's corpus Lloyd pass for `brute`), lower
  *                 median of 3 fresh executions;
  *   cand_assign — (row, candidate-centroid) pairs the FINAL corpus
  *                 assignment scores: two-level = bucket-join matches +
  *                 longest-prefix orphan candidates; brute = n·k;
  *   orphans     — rows that fell off the common path (expected ~0).
  *
  * Usage: runMain graft.tools.CentroidAssignProbe [sfDir] [policy] [mode]
  *   policy: semdedup (k = ceil(n/256)) | ivf (k = ceil(√n))
  *   mode:   scaled (ivfTrainScaled)    | brute (ivfTrain at the same k)
  */
object CentroidAssignProbe {
  private def median3(run: () => Unit): Double = {
    run() // warm
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      run()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    times(times.size / 2)
  }

  def measure(spark: SparkSession, sfDir: String, policy: String,
              mode: String): String = {
    graft.plans.GraftExtensions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint()
    val st = e.agg(count(lit(1)), max(size(col("embedding")))).head
    val (n, dim) = (st.getLong(0), st.getInt(1))
    val kOf: Long => Long = policy match {
      case "semdedup" => m => (m + 255) / 256
      case "ivf" => m => Similarity.scaledCentroids(m)
      case other => throw new IllegalArgumentException(
        s"policy must be semdedup|ivf, got $other")
    }
    val k = math.max(1L, kOf(n))

    def train(): (DataFrame, DataFrame) = mode match {
      case "scaled" => Similarity.ivfTrainScaled(e, "vec_id", "embedding", kOf)
      case "brute" => Similarity.ivfTrain(e, "vec_id", "embedding", k.toInt)
      case other => throw new IllegalArgumentException(
        s"mode must be scaled|brute, got $other")
    }
    val trainSec = median3(() => train()._2.queryExecution.toRdd.count())
    val (cent, asg) = train()
    val kc = cent.count()
    val asgRows = asg.count()

    // candidate volume of the FINAL corpus assignment, re-derived the
    // way the operator derives it
    val (cand, orphans, bits) = mode match {
      case "brute" => (n * kc, 0L, -1)
      case _ =>
        val target = 16L
        val b = Similarity.annBits(kc, target)
        if (b == 0) (n * kc, 0L, 0)
        else {
          val csig = cent.select(col("cid"),
            Similarity.hyperplaneBucketD(col("cv"), b, dim).as("__csig"))
            .localCheckpoint()
          val rsig = e.select(col("vec_id"),
            Similarity.hyperplaneBucket(col("embedding"), b, dim).as("__rsig"))
            .localCheckpoint()
          val matched = rsig.join(csig, col("__rsig") === col("__csig")).count()
          val orphanRows = rsig.join(
            csig.select(col("__csig").as("__rsig")).distinct(),
            Seq("__rsig"), "left_anti").localCheckpoint()
          val nOrphan = orphanRows.count()
          // orphan candidates at their longest occupied prefix
          val orphanCand =
            if (nOrphan == 0) 0L
            else {
              def prefixes(sig: org.apache.spark.sql.Column) =
                explode(array((0 until b).map(l =>
                  struct(lit(l).as("L"),
                    shiftright(sig, b - l).as("pre"))): _*))
              val rpre = orphanRows.select(col("vec_id"),
                  prefixes(col("__rsig")).as("lp"))
                .select(col("vec_id"), col("lp.L").as("L"), col("lp.pre").as("pre"))
              val cpre = csig.select(prefixes(col("__csig")).as("lp"), col("cid"))
                .select(col("lp.L").as("L"), col("lp.pre").as("pre"), col("cid"))
              val lstar = rpre.join(cpre.select(col("L"), col("pre")).distinct(),
                  Seq("L", "pre"))
                .groupBy(col("vec_id")).agg(max(col("L")).as("L"))
              rpre.join(lstar, Seq("vec_id", "L")).join(cpre, Seq("L", "pre")).count()
            }
          (matched + orphanCand, nOrphan, b)
        }
    }
    graft.runtime.Checkpoints.release()
    f"""{"sf":"$sfDir","policy":"$policy","mode":"$mode","n":$n,"k":$k,""" +
      f""""k_trained":$kc,"bits":$bits,"asg_rows":$asgRows,""" +
      f""""cand_assign":$cand,"cand_per_row":${cand.toDouble / n}%.1f,""" +
      f""""orphans":$orphans,"train_sec":$trainSec%.3f}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val policy = args.lift(1).getOrElse("semdedup")
    val mode = args.lift(2).getOrElse("scaled")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-centroidassignprobe")
    spark.sparkContext.setLogLevel("WARN")
    println("[centassign] " + measure(spark, sfDir, policy, mode))
    spark.stop()
  }
}
