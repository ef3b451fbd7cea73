package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Analytics

class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  test("exact regime: rollup + merge + topk reproduce plain counts, deterministic order") {
    // 20 distinct items, capacity 64 → no purges ever, counts exact;
    // 16 partitions force partial buffers through serialize/deserialize
    val df = spark.range(0, 10000, 1, 16)
      .select(($"id" % 5).as("bucket"), concat(lit("item"), $"id" % 20).as("term"))
    val hh = Analytics.freqTopK(
      Analytics.freqRollup(df, col("bucket"), col("term"), maxMapSize = 64), k = 25)
      .collect()
    val want = df.groupBy($"term").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"term").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(hh.map(r => (r.getString(0), r.getLong(1))).toSeq == want.toSeq)
    // exact regime: both bounds collapse onto the estimate
    hh.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) && r.getLong(1) == r.getLong(3), r.toString)
    }
  }

  test("approximate regime: a true heavy hitter survives purges with honest bounds") {
    GraftExtensions.register(spark)
    // 2000 distinct light items + one item covering 20% of rows, but a
    // capacity of only 32 — far past the exact regime
    val df = spark.range(0, 50000, 1, 8).select(
      when($"id" % 5 === 0, lit("HEAVY"))
        .otherwise(concat(lit("light"), $"id" % 2000)).as("term"))
    val out = df.agg(call_function("freq_sketch_agg", $"term", lit(32)).as("fsketch"))
      .select(explode(call_function("freq_topk", $"fsketch", lit(1))).as("hh"))
      .select("hh.item", "hh.estimate", "hh.lower_bound", "hh.upper_bound")
      .collect()(0)
    assert(out.getString(0) == "HEAVY", out.toString)
    val trueCount = 10000L
    assert(out.getLong(2) <= trueCount && trueCount <= out.getLong(3),
      s"bounds must bracket the true count: $out")
  }

  test("bucketed-then-merged ≡ one sketch over the raw union in the exact regime") {
    val df = spark.range(0, 5000, 1, 8)
      .select(($"id" % 7).as("bucket"), concat(lit("w"), $"id" % 15).as("term"))
    val viaBuckets = Analytics.freqTopK(
      Analytics.freqRollup(df, col("bucket"), col("term"), 256), 15).collect()
    val direct = Analytics.freqTopK(
      Analytics.freqRollup(df, lit(0).as("bucket"), col("term"), 256), 15).collect()
    assert(viaBuckets.map(_.toSeq).toSeq == direct.map(_.toSeq).toSeq)
  }

  test("nulls are skipped; an all-null bucket yields a null sketch that merge ignores") {
    GraftExtensions.register(spark)
    val df = Seq((1, Some("a")), (1, None), (2, None)).toDF("bucket", "term")
    val sk = Analytics.freqRollup(df, col("bucket"), col("term"), 64)
      .orderBy("bucket").collect()
    assert(sk(0).getAs[Array[Byte]]("fsketch") != null)
    assert(sk(1).getAs[Array[Byte]]("fsketch") == null)
    val hh = Analytics.freqTopK(
      Analytics.freqRollup(df, col("bucket"), col("term"), 64), 5).collect()
    assert(hh.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("a", 1L)))
  }

  test("freq_sketch_agg aggregates across micro-batches (streaming state round-trips)") {
    implicit val sqlCtx = spark.sqlContext
    GraftExtensions.register(spark)
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("bucket", "term")
      .groupBy($"bucket")
      .agg(call_function("freq_sketch_agg", $"term", lit(64)).as("fsketch"))
      .select($"bucket", explode(call_function("freq_topk", $"fsketch", lit(3))).as("hh"))
      .select($"bucket", $"hh.item", $"hh.estimate")
      .writeStream.format("memory").queryName("freq_hh").outputMode("complete").start()
    try {
      mem.addData((1L, "x"), (1L, "x"), (1L, "y"))
      q.processAllAvailable()
      mem.addData((1L, "x"), (1L, "z")) // state must carry prior counts
      q.processAllAvailable()
      val rows = spark.table("freq_hh").collect()
        .map(r => (r.getString(1), r.getLong(2))).toMap
      assert(rows == Map("x" -> 3L, "y" -> 1L, "z" -> 1L), rows.toString)
    } finally q.stop()
  }
}
