package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Analytics

class KllSketchSpec extends SparkSpec {
  import spark.implicits._

  test("quantileRollup + quantileEstimate: merged estimate within KLL rank error of exact") {
    // 100k values in 10 buckets, many partitions — partial buffers cross
    // the exchange through serialize/deserialize
    val df = spark.range(0, 100000, 1, 16)
      .select(($"id" % 10).as("bucket"), $"id".cast("double").as("v"))
    val sketches = Analytics.quantileRollup(df, col("bucket"), col("v"))
    assert(sketches.count() == 10)
    val est = Analytics.quantileEstimate(sketches, Seq(0.5, 0.95, 0.99)).collect()(0)
    assert(est.getAs[Long]("n_rows") == 100000L)
    // values are 0..99999 uniform: quantile q ≈ q*100000. k=200 gives
    // ~1.65% single-sided normalized rank error (99% conf); assert ±3%
    def rankOf(v: Double): Double = v / 100000.0
    assert(math.abs(rankOf(est.getAs[Double]("p50")) - 0.50) < 0.03, est.toString)
    assert(math.abs(rankOf(est.getAs[Double]("p95")) - 0.95) < 0.03, est.toString)
    assert(math.abs(rankOf(est.getAs[Double]("p99")) - 0.99) < 0.03, est.toString)
  }

  test("bucketed-then-merged ranks match one sketch over the raw union within 2x rank error") {
    val df = spark.range(0, 50000, 1, 8)
      .select(($"id" % 7).as("bucket"), ($"id" * 13 % 50000).cast("double").as("v"))
    val viaBuckets = Analytics.quantileEstimate(
      Analytics.quantileRollup(df, col("bucket"), col("v")), Seq(0.5, 0.9)).collect()(0)
    val direct = Analytics.quantileEstimate(
      Analytics.quantileRollup(df, lit(0).as("bucket"), col("v")), Seq(0.5, 0.9)).collect()(0)
    // both carry the same rank-error bound; their difference is ≤ the sum
    assert(math.abs(viaBuckets.getAs[Double]("p50") - direct.getAs[Double]("p50")) < 50000 * 0.04)
    assert(math.abs(viaBuckets.getAs[Double]("p90") - direct.getAs[Double]("p90")) < 50000 * 0.04)
  }

  test("kll_merge_agg adopts the first sketch's k instead of flooring to the default") {
    GraftExtensions.register(spark)
    val df = spark.range(0, 10000, 1, 4).select($"id".cast("double").as("v"))
    // high-k sketches: rank error ~0.4% at k=800
    val hk = df.agg(call_function("kll_sketch_agg", $"v", lit(800)).as("qsketch"))
      .withColumn("n_rows", lit(10000L))
    val merged = Analytics.quantileEstimate(hk, Seq(0.5)).collect()(0)
    // a k=200 floor would still pass a loose bound — instead assert the
    // sketch object survived with k=800 by checking tight accuracy
    assert(math.abs(merged.getAs[Double]("p50") / 10000.0 - 0.5) < 0.01, merged.toString)
  }

  test("null values are skipped; an all-null bucket yields a null sketch and null quantile") {
    GraftExtensions.register(spark)
    val df = Seq((1, Some(5.0)), (1, None), (2, None))
      .toDF("bucket", "v")
    val sk = Analytics.quantileRollup(df, col("bucket"), col("v")).orderBy("bucket").collect()
    assert(sk(0).getAs[Array[Byte]]("qsketch") != null)
    assert(sk(1).getAs[Array[Byte]]("qsketch") == null)
    val q = Analytics.quantileEstimate(
      Analytics.quantileRollup(df, col("bucket"), col("v")), Seq(0.5)).collect()(0)
    // bucket 2 contributes nothing; the single real value is the median
    assert(q.getAs[Double]("p50") == 5.0)
  }
}
