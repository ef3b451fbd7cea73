package graft.operators

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomJoinSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def fact = Seq(
    (1L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (3L, "e"),
    (4L, "f"), (5L, "g"), (6L, "h"), (7L, "i"), (8L, "j")
  ).toDF("k", "payload")

  private def dim = Seq(1L, 3L, 7L).toDF("k")

  test("semiJoin ≡ plain left_semi join") {
    val got = BloomJoin.semiJoin(fact, dim, Seq("k")).orderBy("k", "payload")
    val want = fact.join(dim, Seq("k"), "left_semi").orderBy("k", "payload")
    assert(got.collect().toSeq == want.collect().toSeq)
  }

  test("probe admits every built key (no false negatives) on adversarial sizes") {
    // tiny filter + many keys: saturated bloom must still admit members
    val keys = (0L until 500L).toDF("k")
    val bloom = BloomJoin.buildBloom(keys, Seq(col("k")), numBits = 64, numHashes = 3)
    val admitted = keys.crossJoin(bloom)
      .filter(BloomJoin.mightContain(col("bloom"), Seq(col("k")), 64, 3))
      .count()
    assert(admitted == 500L)
  }

  test("prefilter drops non-candidate fact rows before the confirm join") {
    // selective dim over a wide key space: the bloom must reject most rows
    val wideFact = (0L until 10000L).toDF("k")
    val smallDim = Seq(17L, 4242L).toDF("k")
    val bloom = BloomJoin.buildBloom(smallDim, Seq(col("k")))
    val survivors = wideFact.crossJoin(bloom)
      .filter(BloomJoin.mightContain(col("bloom"), Seq(col("k")), 1 << 16, 4))
      .count()
    // 2 true members + expected FP ≈ n·(k·m/numBits)^k ≪ 100
    assert(survivors >= 2 && survivors < 100,
      s"bloom admitted $survivors of 10000 rows — not selective")
  }

  test("null fact keys are dropped (semi-join equality semantics)") {
    val withNull = fact.union(Seq((null.asInstanceOf[java.lang.Long], "z"))
      .toDF("k", "payload").select(col("k").cast("long"), col("payload")))
    val got = BloomJoin.semiJoin(withNull, dim, Seq("k"))
    assert(got.filter(col("k").isNull).count() == 0)
  }

  test("probe is a plain literal filter on the fact side, below the confirm join") {
    // the whole point of the operator: the probe consumes the raw fact
    // scan and the exact semi join only its survivors. With the bloom
    // embedded as an array literal the probe is an ordinary filter —
    // nothing for join reordering to invert, no BroadcastNestedLoopJoin
    // to break whole-stage codegen over the scan
    // a parquet-backed fact side: a Seq-based LocalRelation would let
    // ConvertToLocalRelation evaluate the probe at plan time and hide
    // it from the plan entirely
    val pfact = graft.sources.Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey").as("k"))
    val pdim = graft.sources.Tables.orders(spark, "/root/testdata/sf0.001")
      .filter(col("o_totalprice") > 300000)
      .select(col("o_orderkey").as("k"))
    val plan = BloomJoin.semiJoin(pfact, pdim, Seq("k"))
      .queryExecution.executedPlan
    val asString = plan.toString
    assert(!asString.contains("BroadcastNestedLoopJoin"), asString)
    val semiAt = asString.indexOf("LeftSemi")
    // the probe's xxhash64(k, <probe index>, <seed>) calls sit in the
    // semi join's LEFT subtree (printed after the join node, before the
    // build side's BroadcastExchange)
    val probeAt = asString.indexOf("xxhash64")
    assert(semiAt >= 0 && probeAt > semiAt,
      s"probe filter must sit below the semi join:\n$asString")
  }

  test("empty dim yields empty result, not a failure") {
    assert(BloomJoin.semiJoin(fact, dim.filter(lit(false)), Seq("k")).count() == 0)
  }

  test("semiJoinLazy runs NO job at composition and matches the eager result") {
    // a listener-counted job barrier: constructing the lazy form must not
    // touch the cluster (the eager form deliberately runs the bloom build)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      org.apache.spark.sql.graftbridge.GraftShim.drainListenerBus(spark)
      val before = jobs.get()
      val lazyDf = BloomJoin.semiJoinLazy(fact, dim, Seq("k"))
      org.apache.spark.sql.graftbridge.GraftShim.drainListenerBus(spark)
      assert(jobs.get() == before,
        s"semiJoinLazy ran ${jobs.get() - before} job(s) at composition")
      val got = lazyDf.orderBy("k", "payload").collect().toSeq
      val want = BloomJoin.semiJoin(fact, dim, Seq("k")).orderBy("k", "payload").collect().toSeq
      assert(got == want)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("semiJoinLazy builds the bloom subquery ONCE despite 2k probe references") {
    val pfact = graft.sources.Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey").as("k"))
    val pdim = graft.sources.Tables.orders(spark, "/root/testdata/sf0.001")
      .filter(col("o_totalprice") > 300000)
      .select(col("o_orderkey").as("k"))
    val df = BloomJoin.semiJoinLazy(pfact, pdim, Seq("k"))
    // one distinct subquery expression id across all probe references
    val subIds = df.queryExecution.analyzed.collect { case p => p.expressions }.flatten
      .flatMap(_.collect {
        case s: org.apache.spark.sql.catalyst.expressions.ScalarSubquery => s.exprId
      }).distinct
    assert(subIds.size == 1, s"expected one shared bloom subquery, got $subIds")
    assert(df.count() == pfact.join(pdim, Seq("k"), "left_semi").count())
  }
}
