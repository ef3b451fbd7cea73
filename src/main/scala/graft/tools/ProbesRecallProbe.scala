package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{Similarity, VectorIndex}
import graft.sources.SnapshotStore

/** Recall@k versus PROBE COUNT for the commit-maintained IVF index —
  * the measurement behind `scaledProbes` (r17 verdict: DriftRecallProbe
  * pinned the retrain POLICY with numbers, but absolute recall@10 at
  * the then-default probes = 2 was 0.57–0.65 with no curve and no
  * corpus-scaled default; probes is the recall lever, so the default
  * deserves the same evidence every other scaled knob got). Setup: the
  * corpus trains a √n-centroid sidecar exactly like production
  * ([[VectorIndex.ivfRefresh]]); a deterministic query panel (lowest
  * ids + modular strides through the id range) measures recall against
  * exact brute-force top-k at each probe count.
  *
  * Usage: runMain graft.tools.ProbesRecallProbe [sfDir] [probesCsv] [k]
  *
  * `sfDir` may be `planted:<n>:<clusters>:<dim>[:<jitter>]` instead of a path:
  * a deterministic PLANTED-CLUSTER corpus (cluster centers at hashed
  * uniform coordinates, members jittered ±jitter (default 0.08) around their center) —
  * the middle point between the two shipped calibration corpora
  * (near-uniform sf0.1, IVF's worst case, and the replica-clustered
  * sf1 scale-up, its best case): true neighbors mostly share a
  * planted cluster but jitter makes boundary flips real.
  */
object ProbesRecallProbe {

  /** Deterministic planted-cluster corpus: no RNG, every value a hash
    * of (cluster-or-row, dim) — reruns identical anywhere. Shared with
    * [[DriftRecallProbe]] so both calibrations bracket on the same
    * three corpus shapes. GENERATED DISTRIBUTED (spark.range + hash
    * expressions; a cluster's center recomputes per row as a pure
    * function of `vec_id % clusters`) — a driver-local Seq would
    * serialize n·dim boxed floats into the plan and OOM the driver at
    * the very scales a calibration corpus exists to probe.
    */
  private[tools] def plantedCorpus(spark: SparkSession, n: Int, clusters: Int,
                            dim: Int, jitter: Double): org.apache.spark.sql.DataFrame = {
    // uniform [-1, 1) from xxhash64 of the tagged key columns
    def u(parts: org.apache.spark.sql.Column*): org.apache.spark.sql.Column =
      pmod(xxhash64(parts: _*), lit(1L << 53)).cast("double") /
        lit((1L << 53).toDouble) * lit(2.0) - lit(1.0)
    spark.range(n.toLong).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), d =>
        (u(lit("c"), pmod(col("id"), lit(clusters.toLong)), d) +
          lit(jitter) * u(lit("r"), col("id"), d)).cast("float")).as("embedding"))
  }

  /** `<path>` or `planted:<n>:<clusters>:<dim>[:<jitter>]`. */
  private[tools] def loadCorpus(spark: SparkSession, sfDir: String)
      : org.apache.spark.sql.DataFrame =
    (if (sfDir.startsWith("planted:")) {
      val parts = sfDir.split(':')
      plantedCorpus(spark, parts(1).toInt, parts(2).toInt, parts(3).toInt,
        parts.lift(4).map(_.toDouble).getOrElse(0.08))
    } else spark.read.parquet(s"$sfDir/embeddings.parquet"))
      .select(col("vec_id"), col("embedding"))

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

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val probesList = args.lift(1).getOrElse("1,2,4,8,16")
      .split(",").map(_.trim.toInt).toSeq
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-probesrecall")
    spark.sparkContext.setLogLevel("WARN")
    val base = loadCorpus(spark, sfDir)
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val n = base.count()
    val numCentroids = Similarity.scaledCentroids(n)
    val dir = java.nio.file.Files.createTempDirectory("graft-probesrecall").toString
    val tbl = s"file:$dir/emb"
    val idx = s"file:$dir/ivf"
    SnapshotStore.append(base, tbl, statsCols = Seq("vec_id"))
    VectorIndex.ivfRefresh(spark, tbl, "vec_id", "embedding", idx, numCentroids)
    // deterministic panel: 5 lowest ids + 5 modular strides through the
    // id range — resident AND spread query points, no RNG
    val ids = base.orderBy(col("vec_id")).select(col("vec_id"))
      .collect().map(_.getLong(0))
    val panel = (ids.take(5) ++
      (1 to 5).map(j => ids(((ids.length - 1).toLong * j / 5).toInt))).distinct.toSeq
    probesList.foreach { p =>
      val r = recallAtK(spark, tbl, idx, panel, k, p, numCentroids)
      val s = Similarity.scaledProbes(numCentroids)
      graft.runtime.Checkpoints.release()
      println(f"""[probesrecall] {"sf_dir":"$sfDir","rows":$n,""" +
        f""""centroids":$numCentroids,"probes":$p,"k":$k,"recall":$r%.3f,""" +
        f""""scaled_probes_default":$s}""")
    }
    spark.stop()
  }
}
