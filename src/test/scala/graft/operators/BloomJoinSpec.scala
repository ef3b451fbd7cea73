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

  test("probe filter stays BELOW the confirm join (semi-push blocked)") {
    // the whole point of the operator: the broadcast+probe must consume
    // the raw fact scan, and the exact semi join only its survivors —
    // without the cross-side guard conjunct, Catalyst's
    // PushLeftSemiLeftAntiThroughJoin inverts that order
    val plan = BloomJoin.semiJoin(fact, dim, Seq("k")).queryExecution.executedPlan
    val asString = plan.toString
    assert(asString.contains("BroadcastNestedLoopJoin"),
      s"expected a broadcast of the 1-row bloom table in:\n$asString")
    val semiAt = asString.indexOf("LeftSemi")
    val crossAt = asString.indexOf("BroadcastNestedLoopJoin")
    assert(semiAt >= 0 && crossAt > semiAt,
      s"bloom cross+probe must be BELOW (printed after) the semi join:\n$asString")
  }

  test("empty dim yields empty result, not a failure") {
    assert(BloomJoin.semiJoin(fact, dim.filter(lit(false)), Seq("k")).count() == 0)
  }
}
