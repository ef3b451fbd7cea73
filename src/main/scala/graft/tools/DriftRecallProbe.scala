package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{Similarity, VectorIndex}
import graft.sources.SnapshotStore

/** Recall measurement behind `driftRetrainFraction` (VectorIndex's IVF
  * ingest policy): the 0.5 default is row-count-based with no measured
  * recall story — this probe turns it into a recommendation with
  * numbers. Setup: a base corpus trains the sidecar; waves of
  * OUT-OF-DISTRIBUTION vectors (reversed dims, wave-keyed sign flips —
  * directions the trained centroids never saw, the worst case for
  * delta-assign) append up to each drift fraction. At each fraction two
  * sidecars answer the same queries over the same grown table:
  *
  *   delta   — never retrains (driftRetrainFraction = ∞): every wave
  *             assigned O(delta) against the ORIGINAL centroids
  *   retrain — force-retrained after every wave (the other extreme)
  *
  * and recall@k is measured against the exact brute-force top-k, over
  * base-resident AND appended query points. The gap between the two
  * columns at each fraction IS the price of not retraining — where it
  * widens is where the default belongs.
  *
  * Usage: runMain graft.tools.DriftRecallProbe [sfDir] [fractionsCsv] [k] [probes]
  * (`sfDir` also accepts ProbesRecallProbe's `planted:` corpus syntax)
  */
object DriftRecallProbe {

  /** Smallest power of 10 strictly greater than `n` — the wave stride,
    * derived from the corpus so consecutive waves (each holding up to
    * nBase rows built from base ids < stride) can NEVER overlap each
    * other or the base id range; a fixed 1e6 stride collided past ~1M
    * embeddings, silently planting duplicate ids in the snapshot table
    * and corrupting the recall denominator.
    */
  private def waveStride(maxBaseId: Long): Long = {
    var s = 10000000L
    while (s <= maxBaseId) s *= 10
    s
  }

  /** Wave w of out-of-distribution vectors: reverse the dims and flip
    * signs on a wave-keyed parity — in-norm but in directions the base
    * corpus does not populate. Ids shift past the base range in
    * disjoint per-wave bands of width `stride`.
    */
  private def oodWave(base: DataFrame, w: Int, rows: Int, stride: Long): DataFrame =
    base.orderBy(col("vec_id")).limit(rows)
      .select((col("vec_id") + lit((w + 1) * stride)).as("vec_id"),
        expr(s"transform(reverse(embedding), (x, i) -> " +
          s"CASE WHEN (i + $w) % 2 = 0 THEN x ELSE -x END)").as("embedding"))

  private def recallAtK(spark: SparkSession, tbl: String, idx: String,
                        queryIds: Seq[Long], k: Int, probes: Int,
                        numCentroids: Int): Double = {
    val corpus = SnapshotStore.snapshot(spark, tbl)
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val hits = queryIds.map { q =>
      val truth = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, k)
        .collect().map(_.getLong(0)).toSet
      val got = VectorIndex.ivfProbeIndexed(spark, tbl, "vec_id", "embedding",
          idx, queryId = q, k = k, probes = probes, numCentroids = numCentroids)
        .collect().map(_.getLong(0)).toSet
      (got intersect truth).size.toDouble / k
    }
    hits.sum / hits.size
  }

  def measure(spark: SparkSession, sfDir: String, fractions: Seq[Double],
              k: Int, probes: Int): Unit = {
    // `planted:<n>:<clusters>:<dim>[:<jitter>]` builds the deterministic
    // planted-cluster corpus (ProbesRecallProbe's generator) — the
    // retrain policy bracketed on the same three shapes as scaledProbes
    val base = ProbesRecallProbe.loadCorpus(spark, sfDir).localCheckpoint()
    val nBase = base.count()
    val stride = waveStride(
      base.agg(max(col("vec_id"))).head.getLong(0).max(nBase))
    val numCentroids = math.ceil(math.sqrt(nBase.toDouble)).toInt
    val dir = java.nio.file.Files.createTempDirectory("graft-driftrecall").toString
    val tbl = s"file:$dir/emb"
    val (idxD, idxR) = (s"file:$dir/ivf_delta", s"file:$dir/ivf_retrain")
    SnapshotStore.append(base, tbl, statsCols = Seq("vec_id"))
    VectorIndex.ivfRefresh(spark, tbl, "vec_id", "embedding", idxD, numCentroids)
    VectorIndex.ivfRefresh(spark, tbl, "vec_id", "embedding", idxR, numCentroids)
    // deterministic query panel: lowest base ids + (later) lowest OOD ids
    val baseQs = base.orderBy(col("vec_id")).limit(5)
      .collect().map(_.getLong(0)).toSeq
    var appended = 0L
    fractions.zipWithIndex.foreach { case (f, w) =>
      val target = math.round(nBase * f)
      val waveRows = (target - appended).toInt
      if (waveRows > 0) {
        SnapshotStore.append(oodWave(base, w, waveRows, stride), tbl)
        appended = target
      }
      // delta index: never retrain; retrain index: always retrain
      VectorIndex.ivfRefresh(spark, tbl, "vec_id", "embedding", idxD,
        numCentroids, driftRetrainFraction = Double.MaxValue)
      VectorIndex.ivfRefresh(spark, tbl, "vec_id", "embedding", idxR,
        numCentroids, force = true)
      val deltaAction = SnapshotStore.history(spark, s"$idxD/assignments").head._2
      val oodQs = SnapshotStore.snapshot(spark, tbl)
        .filter(col("vec_id") >= stride)
        .orderBy(col("vec_id")).limit(5).collect().map(_.getLong(0)).toSeq
      val qs = baseQs ++ oodQs
      val rd = recallAtK(spark, tbl, idxD, qs, k, probes, numCentroids)
      val rr = recallAtK(spark, tbl, idxR, qs, k, probes, numCentroids)
      graft.runtime.Checkpoints.release()
      println(f"""[driftrecall] {"fraction":$f%.2f,"rows":${nBase + appended},""" +
        f""""delta_action":"$deltaAction","recall_delta":$rd%.3f,""" +
        f""""recall_retrain":$rr%.3f,"k":$k,"probes":$probes,""" +
        f""""centroids":$numCentroids}""")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val fractions = args.lift(1).getOrElse("0.1,0.25,0.5,1.0")
      .split(",").map(_.trim.toDouble).toSeq
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val probes = args.lift(3).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-driftrecall")
    spark.sparkContext.setLogLevel("WARN")
    measure(spark, sfDir, fractions, k, probes)
    spark.stop()
  }
}
