package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Approximate aggregates: engine-specific (HLL/KLL sketches), so they
  * are spec-checked against exact answers rather than the SQL oracle.
  */
class AnalyticsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("approx_count_distinct within 5% of exact") {
    val li = Tables.lineitem(spark, sf)
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx"))
      .collect().head
    val (exact, approx) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact <= 0.05, s"exact=$exact approx=$approx")
  }

  test("approx_percentile brackets the exact median") {
    val li = Tables.lineitem(spark, sf)
    val r = li.agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact"),
      expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx"))
      .collect().head
    val (exact, approx) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(approx - exact) / exact <= 0.02, s"exact=$exact approx=$approx")
  }

  test("exactPercentiles matches the builtin for a NULL group key") {
    import spark.implicits._
    val df = Seq(
      (Some("a"), Some(1.0)), (Some("a"), Some(3.0)),
      (None, Some(10.0)), (None, Some(20.0)), (None, Some(30.0)),
      (Some("b"), None) // all-null group → null percentiles
    ).toDF("g", "v")
    val out = Analytics.exactPercentiles(df, "g", "v", Seq("p50" -> 0.5))
      .collect().map(r => Option(r.get(0)) -> Option(r.get(1))).toMap
    assert(out(Some("a")) == Some(2.0))
    assert(out(None) == Some(20.0), "null group key must get real percentiles, like the builtin")
    assert(out(Some("b")).isEmpty)
  }

  test("sketchRollup: merged daily sketches estimate EXACTLY like one global sketch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val events = (0 until 20000).map { i =>
      (i % 7, s"user_${i % 3171}") // 7 "days", 3171 distinct users
    }.toDF("day", "user")
    val daily = Analytics.sketchRollup(events, col("day"), col("user"))
    assert(daily.count() == 7)
    val merged = Analytics.sketchEstimate(daily).head()
    // HLL union is register-wise max: merging per-day sketches must give
    // the IDENTICAL estimate as sketching the raw union directly
    val global = events.agg(
      hll_sketch_estimate(hll_sketch_agg(col("user"), lit(12)))).head().getLong(0)
    assert(merged.getLong(0) == global,
      s"merged=${merged.getLong(0)} global=$global")
    assert(merged.getLong(1) == 20000L)
    // and the estimate is an estimate of the right thing
    assert(math.abs(merged.getLong(0) - 3171L).toDouble / 3171 <= 0.05,
      s"estimate ${merged.getLong(0)} too far from 3171")
  }

  test("histogram rollup: merged-bucket quantiles exact, ≡ direct computation") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    // 1..100 spread across 4 buckets: type-1 p50 = 50, p95 = 95
    val df = spark.range(1, 101).select(($"id" % 4).as("b"), $"id".cast("double").as("x"))
    val hist = Analytics.histogramRollup(df, col("b"), col("x"))
    assert(hist.count() == 100) // 100 distinct values spread over buckets
    val q = Analytics.histogramQuantiles(hist, Seq(0.5, 0.95)).collect()(0)
    assert(q.getDouble(0) == 50.0 && q.getDouble(1) == 95.0 && q.getLong(2) == 100L, q.toString)
    // mergeability: a bucket-range re-aggregation ≡ computing over the
    // range's raw rows directly
    val range = hist.filter($"bucket".isin(1, 2))
    val viaHist = Analytics.histogramQuantiles(range, Seq(0.5)).collect()(0)
    val raw = df.filter($"b".isin(1, 2))
    val direct = Analytics.histogramQuantiles(
      Analytics.histogramRollup(raw, col("b"), col("x")), Seq(0.5)).collect()(0)
    assert(viaHist == direct, s"$viaHist vs $direct")
  }
}
