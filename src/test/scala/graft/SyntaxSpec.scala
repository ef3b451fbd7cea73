package graft

import org.apache.spark.sql.functions._

import graft.syntax._

/** The fluent API delegates to the operator objects — a chained
  * reference-pipeline flow through the implicit syntax only.
  */
class SyntaxSpec extends SparkSpec {
  import spark.implicits._

  test("a reference-style flow chains through the fluent API") {
    val signals = Seq((1L, 10L, 1.0), (1L, 25L, 2.0)).toDF("k", "ts", "v")
    val readings = Seq((1L, 8L, 10.0), (1L, 24L, 20.0)).toDF("k", "t", "r")
    val joined = signals.asOf(readings, Seq("k"), "ts", "t", Seq("r"))
      .orderBy("ts").select("ts", "r").as[(Long, Double)].collect().toSeq
    assert(joined == Seq((10L, 10.0), (25L, 20.0)))

    val grid = signals.timeGrid(Seq("k"), "ts", 10L)
    assert(grid.count() == 2) // ticks 10 and 20 (floor(min)..max)
    val filled = signals
      .select(col("k"), col("ts"), when(col("ts") === 10L, col("v")).as("v"))
      .forwardFill(Seq("k"), Seq("ts"), Seq("v"))
    assert(filled.orderBy("ts").select("v").as[Double].collect().toSeq == Seq(1.0, 1.0))

    val docs = Seq((1L, "a b c a b c"), (2L, "a b c a b c"), (3L, "x y z q"))
      .toDF("doc_id", "text")
    assert(docs.dedupExact("doc_id", "text").count() == 2)
    val pairs = docs.dedupMinHashPairs("doc_id", "text")
    val clusters = pairs.dupClusters("doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L))

    val split = docs.hashSplit("doc_id", "s", 50, 25)
    assert(split.columns.contains("split") && split.count() == 3)

    val vecs = Seq((1L, Seq(1f, 0f)), (2L, Seq(1f, 0.001f)), (3L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
    val sd = vecs.semDedup("vec_id", "embedding", k = 2, iters = 1,
      minCosine = 0.99).collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(sd == Map(1L -> true, 2L -> false, 3L -> true))

    val mix = Seq(("a", 100.0, 1.0), ("b", 1000.0, 1.0))
      .toDF("source", "mass", "weight")
      .budgetMix("source", "mass", "weight", budget = 500.0, maxEpochs = 1.0)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("allocation")).toMap
    assert(mix == Map("a" -> 100.0, "b" -> 400.0))
  }
}
