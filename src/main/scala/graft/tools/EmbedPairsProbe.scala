package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Similarity
import graft.sources.Tables

/** Phase attribution for embedding near-dup pairs
  * ([[Similarity.cosinePairs]] — the r15 scale-step worst entry at
  * 6.62×): splits the operator into its two phases and counts the
  * candidate volume that connects them, at a given bucket policy.
  *
  *   sig   — signature build: project (id, vec, bucket) and
  *           materialize (the localCheckpoint both join branches read);
  *   join  — bucket self-join + fused cosine + threshold filter over
  *           the materialized signatures (full-plan toRdd evaluation);
  *   cand  — Σ over buckets of |b|·(|b|−1)/2: the exact within-bucket
  *           pair count the join must score. THIS is the quantity a
  *           fixed bucket count lets grow quadratically (n²/2B) and a
  *           corpus-scaled bucket count pins to ~n·target/2.
  *
  * Policies: `fixed` = [[Similarity.signBucket]] at `param` bits (the
  * pre-r16 default); `scaled` = [[Similarity.cosinePairsScaled]]'s
  * derivation — hyperplane buckets at ceil(log2(n/param)) bits.
  *
  * Timing is fresh-execution LOWER median of 5 (the Bench / DvProbe
  * operator-level methodology).
  *
  * Usage: runMain graft.tools.EmbedPairsProbe [sfDir] [mode] [param] [minCosine]
  */
object EmbedPairsProbe {
  private def median5(build: () => DataFrame): Double = {
    build().queryExecution.toRdd.count() // warm
    val runs = (1 to 5).map { _ =>
      val df = build()
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    runs(runs.size / 2)
  }

  def measure(spark: SparkSession, sfDir: String, mode: String,
              param: Int, minCosine: Double): String = {
    val e = Tables.embeddings(spark, sfDir)
    val n = e.count()
    val dim = e.select(size(col("embedding"))).head.getInt(0)
    val bits = mode match {
      case "fixed" => param
      case "scaled" => Similarity.scaledBucketBits(n, param)
      case other => throw new IllegalArgumentException(
        s"mode must be fixed|scaled, got $other")
    }
    val bucket = mode match {
      case "fixed" => Similarity.signBucket(col("embedding"), bits)
      case _ => Similarity.hyperplaneBucket(col("embedding"), bits, dim)
    }
    // phase 1: signature build + materialization (what cosinePairsBucketed
    // localCheckpoints once for both join branches)
    val sigSec = {
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        val cp = e.select(col("vec_id"), col("embedding"), bucket.as("__bucket"))
          .localCheckpoint()
        val s = (System.nanoTime() - t0) / 1e9
        cp.unpersist(blocking = true)
        s
      }.sorted
      runs(runs.size / 2)
    }
    val bucketed = e.select(col("vec_id"), col("embedding"), bucket.as("__bucket"))
      .localCheckpoint()
      .repartition(col("__bucket"))
    // candidate volume: exact within-bucket pair count
    val hist = bucketed.groupBy(col("__bucket")).count()
      .agg(count(lit(1)).as("buckets"),
        max(col("count")).as("max_bucket"),
        sum((col("count") * (col("count") - 1) / 2).cast("long")).as("cand"))
      .head
    val (buckets, maxBucket, cand) =
      (hist.getLong(0), hist.getLong(1), hist.getLong(2))
    // phase 2: the bucket self-join + cosine + threshold
    def join(): DataFrame = {
      val a = bucketed.select(col("vec_id").as("vec_a"),
        col("embedding").as("__va"), col("__bucket"))
      val b = bucketed.select(col("vec_id").as("vec_b"),
        col("embedding").as("__vb"), col("__bucket"))
      a.join(b, Seq("__bucket"))
        .filter(col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"),
          round(Similarity.cosineNative(col("__va"), col("__vb")), 6).as("cos"))
        .filter(col("cos") >= minCosine)
    }
    val joinSec = median5(() => join())
    val pairs = join().count()
    f"""{"sf":"$sfDir","mode":"$mode","param":$param,"n":$n,"dim":$dim,""" +
      f""""bits":$bits,"buckets":$buckets,"max_bucket":$maxBucket,""" +
      f""""cand_pairs":$cand,"out_pairs":$pairs,""" +
      f""""sig_sec":$sigSec%.3f,"join_sec":$joinSec%.3f}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val mode = args.lift(1).getOrElse("fixed")
    val param = args.lift(2).map(_.toInt).getOrElse(if (args.lift(1).contains("scaled")) 256 else 4)
    val minCosine = args.lift(3).map(_.toDouble).getOrElse(0.35)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-embpairsprobe")
    spark.sparkContext.setLogLevel("WARN")
    println("[embpairs] " + measure(spark, sfDir, mode, param, minCosine))
    spark.stop()
  }
}
