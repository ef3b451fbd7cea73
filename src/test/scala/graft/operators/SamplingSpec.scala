package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (0L until 400L).map { i =>
    (i, s"src${i % 4}")
  }.toDF("doc_id", "source")

  test("mixture keeps ~rate basis points per source, deterministically") {
    val out = Sampling.mixture(docs, "doc_id", "source", "s1",
      Map("src0" -> 5000, "src1" -> 0))
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // src1 fully dropped; absent sources keep everything
    assert(!bySrc.contains("src1"), bySrc)
    assert(bySrc("src2") == 100L && bySrc("src3") == 100L, bySrc)
    // src0 near half (hash-threshold variance over 100 draws)
    assert(bySrc("src0") > 25L && bySrc("src0") < 75L, bySrc)
    // deterministic: a rerun selects the identical rows
    val again = Sampling.mixture(docs, "doc_id", "source", "s1",
      Map("src0" -> 5000, "src1" -> 0))
    assert(out.exceptAll(again).union(again.exceptAll(out)).isEmpty)
  }

  test("mixture is nested: raising a rate only adds rows") {
    val low = Sampling.mixture(docs, "doc_id", "source", "s1", Map("src0" -> 2000))
      .filter($"source" === "src0").select("doc_id").as[Long].collect().toSet
    val high = Sampling.mixture(docs, "doc_id", "source", "s1", Map("src0" -> 6000))
      .filter($"source" === "src0").select("doc_id").as[Long].collect().toSet
    assert(low.subsetOf(high), s"hash-threshold sampling must be nested")
    assert(low.size < high.size)
  }

  test("mixture stays a map-side filter — no exchange in the plan") {
    val plan = Sampling.mixture(docs, "doc_id", "source", "s1", Map("src0" -> 1))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
