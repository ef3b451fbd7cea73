package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Degenerate-input sweep: empty tables, singleton corpora, k > rows.
  * At 100 TB these are not hypothetical — a partition filter that
  * matches nothing, a first-run corpus, a benchmark table still loading.
  * Every operator must return an EMPTY (or correctly-shaped) result,
  * not throw.
  */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  private def emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private def docs = Seq((1L, "a b c d e"), (2L, "a b c d f")).toDF("doc_id", "text")

  test("dedup family: empty corpus, empty benchmark, singleton corpus") {
    assert(Dedup.exact(emptyDocs, "doc_id", "text").isEmpty)
    assert(Dedup.minHashPairs(emptyDocs, "doc_id", "text").isEmpty)
    assert(Dedup.dupSpans(emptyDocs, "doc_id", "text").isEmpty)
    assert(Dedup.spanCuts(emptyDocs, "doc_id", "text").isEmpty)
    // empty TRAINING side, non-empty benchmark
    assert(Dedup.decontaminate(emptyDocs, docs, "doc_id", "text").isEmpty)
    // empty BENCHMARK: nothing can be contaminated
    assert(Dedup.decontaminate(docs, emptyDocs, "doc_id", "text").isEmpty)
    assert(Dedup.decontaminateBroadcast(docs, emptyDocs, "doc_id", "text").isEmpty)
    // a single doc has no cross-doc duplicates
    val one = Seq((1L, "a b c d")).toDF("doc_id", "text")
    assert(Dedup.minHashPairs(one, "doc_id", "text").isEmpty)
    assert(Dedup.spanCuts(one, "doc_id", "text").isEmpty)
  }

  test("top_k and histogram quantiles: empty input, k larger than data") {
    graft.plans.GraftExtensions.register(spark)
    val emptyOrders = Seq.empty[(String, Long, Double)]
      .toDF("o_orderpriority", "o_orderkey", "o_totalprice")
    assert(Analytics.topNPerGroupAgg(emptyOrders, 5).isEmpty)
    val hist = Analytics.histogramRollup(
      Seq.empty[(Long, Double)].toDF("b", "x"), col("b"), col("x"))
    val q = Analytics.histogramQuantiles(hist, Seq(0.5)).collect()
    // global agg over empty input: one row, null quantile, null count
    assert(q.length == 1 && q(0).isNullAt(0))
  }

  test("bpe: empty corpus trains zero merges; encode with zero rules splits to chars") {
    graft.plans.GraftExtensions.register(spark)
    assert(graft.functions.Bpe.train(emptyDocs, "text", 10) == Seq.empty)
    val out = docs.select(graft.functions.Bpe.encode($"text", Seq.empty).as("t"))
      .collect()(0).getSeq[String](0)
    assert(out == Seq("a", "b", "c", "d", "e"))
  }

  test("kmeans farthest seeding requires data; corpus diff of empty snapshots") {
    // snapshotDiff: empty-vs-empty and empty-vs-full
    assert(Corpus.snapshotDiff(emptyDocs, emptyDocs, "doc_id", "text").isEmpty)
    val added = Corpus.snapshotDiff(emptyDocs, docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(added == Set((1L, "added"), (2L, "added")))
    val removed = Corpus.snapshotDiff(docs, emptyDocs, "doc_id", "text")
      .collect().map(_.getString(1)).toSet
    assert(removed == Set("removed"))
  }

  test("semDedup singleton cluster; budgetMix single source and zero-mass guard") {
    // one vector: one cluster, no pairs, keep = true
    val one = Seq((7L, Seq(1f, 2f, 3f))).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(one, "vec_id", "embedding",
      k = 1, iters = 0, minCosine = 0.9).collect()
    assert(out.length == 1 && out(0).getBoolean(2), "a singleton always keeps")
    // one source: the whole budget (up to its cap) lands on it
    val single = Seq(("only", 100.0, 1.0)).toDF("source", "mass", "weight")
    val a = Sampling.budgetMix(single, "source", "mass", "weight",
      budget = 40.0, maxEpochs = 1.0).collect()(0)
    assert(a.getAs[Double]("allocation") == 40.0 &&
      a.getAs[Double]("epochs") == 0.4)
    // budget above the single cap: capped, under-filled
    val b = Sampling.budgetMix(single, "source", "mass", "weight",
      budget = 500.0, maxEpochs = 2.0).collect()(0)
    assert(b.getAs[Double]("allocation") == 200.0)
    intercept[IllegalArgumentException] {
      Sampling.budgetMix(single, "source", "mass", "weight",
        budget = -1.0, maxEpochs = 1.0)
    }
  }

  test("as-of family: empty left, empty right") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 5L, 1.0)).toDF("k", "rt", "v")
    val emptyL = Seq.empty[(Long, Long)].toDF("k", "t")
    val emptyR = Seq.empty[(Long, Long, Double)].toDF("k", "rt", "v")
    assert(AsOfJoin.asOfNative(emptyL, right, Seq("k"), "t", "rt", Seq("v")).isEmpty)
    // empty right: left rows survive with null value (left-preserving)
    val out = AsOfJoin.asOfNative(left, emptyR, Seq("k"), "t", "rt", Seq("v")).collect()
    assert(out.length == 1 && out(0).isNullAt(out(0).fieldIndex("v")))
    assert(AsOfJoin.rangeJoinNative(emptyL, right, Seq("k"), "t", "rt",
      Seq("v"), 10L, 10L).isEmpty)
    val bcast = AsOfJoin.asOfBroadcast(left, emptyR, Seq("k"), "t", "rt", Seq("v")).collect()
    assert(bcast.length == 1 && bcast(0).isNullAt(bcast(0).fieldIndex("v")))
  }
}
