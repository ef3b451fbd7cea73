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

  test("temperatureMixture flattens toward uniform; smallest source keeps 100%") {
    // 300 / 80 / 20 docs per source
    val skewed = ((0L until 300L).map(i => (i, "big")) ++
      (300L until 380L).map(i => (i, "mid")) ++
      (380L until 400L).map(i => (i, "small"))).toDF("doc_id", "source")
    val out = Sampling.temperatureMixture(skewed, "doc_id", "source", "t", alpha = 0.5)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // smallest keeps everything; rates scale by sqrt(n_min/n):
    // big: 10000*sqrt(20/300)=2581bp of 300 ≈ 77, mid: 5000bp of 80 ≈ 40
    assert(out("small") == 20L, out)
    assert(out("big") < 300L && out("mid") < 80L, out)
    // flattening: post-mix ratio big/small must shrink vs the input 15×
    assert(out("big").toDouble / out("small") < 15.0 / 2, out)
    // α = 1 is the identity schedule
    val id = Sampling.temperatureMixture(skewed, "doc_id", "source", "t", alpha = 1.0)
    assert(id.count() == 400L)
  }

  test("mixture stays a map-side filter — no exchange in the plan") {
    val plan = Sampling.mixture(docs, "doc_id", "source", "s1", Map("src0" -> 1))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("temperatureMixtureWeighted rates follow token mass, not doc counts") {
    import spark.implicits._
    // "fat": 10 docs × 1000 tokens; "thin": 1000 docs × 10 tokens —
    // equal token mass, so BOTH cells keep rate 10000 (ratio 1) even
    // though doc counts differ 100×; the count-based mixture would
    // slash "thin" to sqrt(10/1000) ≈ 10%
    val df = ((0L until 10L).map(i => (i, "fat", 1000L)) ++
      (100L until 1100L).map(i => (i, "thin", 10L)))
      .toDF("id", "src", "toks")
    val kept = Sampling.temperatureMixtureWeighted(df, "id", Seq("src"), "toks",
      "s", alpha = 0.5)
      .groupBy($"src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("fat") == 10L && kept("thin") == 1000L,
      s"equal token mass must keep both cells whole: $kept")
    val byCount = Sampling.temperatureMixture(df, "id", "src", "s", alpha = 0.5)
      .groupBy($"src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byCount("thin") < 1000L, "count-based mixture must down-sample the doc-heavy cell")
  }

  test("budgetMix water-fills: caps bind in ratio order, the rest split at one λ") {
    val perSource = Seq(
      ("tiny", 100.0, 1.0), ("small", 300.0, 1.0),
      ("big", 1000.0, 1.0), ("huge", 2000.0, 1.0)
    ).toDF("source", "mass", "weight")
    // budget 1500, caps at 1 epoch: tiny (100) and small (300) saturate,
    // big/huge split the remaining 1100 at λ = 550 each
    val out = Sampling.budgetMix(perSource, "source", "mass", "weight",
        budget = 1500.0, maxEpochs = 1.0)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("allocation"), r.getAs[Double]("epochs"))).toMap
    assert(out("tiny")._1 === 100.0 && out("small")._1 === 300.0,
      s"capped sources take exactly their caps: $out")
    assert(out("big")._1 === 550.0 && out("huge")._1 === 550.0,
      s"unsaturated sources share one λ: $out")
    assert(math.abs(out.values.map(_._1).sum - 1500.0) < 1e-9, "budget exactly spent")
    assert(out("huge")._2 === 0.275, "epochs = allocation / mass")

    // weights steer the split: huge at weight 3 gets 3x big's allocation
    val weighted = Sampling.budgetMix(
      Seq(("big", 1000.0, 1.0), ("huge", 2000.0, 3.0))
        .toDF("source", "mass", "weight"),
      "source", "mass", "weight", budget = 1200.0, maxEpochs = 10.0)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Double]("allocation")).toMap
    assert(weighted === Map("big" -> 300.0, "huge" -> 900.0), s"$weighted")

    // budget beyond every cap: allocations are the caps, under-filled
    val under = Sampling.budgetMix(perSource, "source", "mass", "weight",
        budget = 1e9, maxEpochs = 2.0)
      .collect().map(r => r.getAs[Double]("allocation")).sum
    assert(under === 2.0 * 3400.0, s"all-capped case allocates Σcap, got $under")
  }

  test("dsirWeights ranks target-like docs above off-target; select keeps the fraction") {
    import spark.implicits._
    // target distribution: spark-ish words; off-target: cooking words
    val raw = Seq(
      (1L, "spark query join filter shuffle"),
      (2L, "spark join scan filter query"),
      (3L, "flour sugar butter oven whisk"),
      (4L, "spark query flour sugar scan"), // mixed
      (5L, "")                              // tokenless
    ).toDF("doc_id", "text")
    val target = Seq(
      (10L, "spark query join shuffle scan"),
      (11L, "query filter join spark scan")
    ).toDF("doc_id", "text")
    val w = Sampling.dsirWeights(raw, target, "doc_id", "text", buckets = 64)
      .select($"doc_id", $"dsir_weight").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // pure-target docs outrank the mixed doc, which outranks pure-off-target
    assert(w(1L) > w(4L) && w(2L) > w(4L), s"target docs must outrank mixed: $w")
    assert(w(4L) > w(3L), s"mixed must outrank off-target: $w")
    assert(w(5L) === 0.0, "tokenless doc weights exactly 0")
    // selection: top half by weight — the two pure-target docs
    val kept = Sampling.dsirSelect(
        Sampling.dsirWeights(raw.filter($"doc_id" =!= 5L), target, "doc_id", "text", buckets = 64),
        keepFraction = 0.5)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept.contains(1L) && kept.contains(2L) && !kept.contains(3L), s"kept: $kept")
  }

  test("leakFreeSplit keeps every near-dup cluster on one side") {
    import spark.implicits._
    val corpus = (0L until 300L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // 100 clusters of 3 (ids 3k, 3k+1, 3k+2 together, labeled by min id)
    val clusters = (0L until 300L).map(i => (i, i / 3 * 3)).toDF("doc_id", "cluster_id")
    val out = Sampling.leakFreeSplit(corpus, clusters, "doc_id", "graft", 80, 10)
      .select($"doc_id", $"split").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byCluster = out.groupBy(_._1 / 3).values
    assert(byCluster.forall(_.map(_._2).toSet.size == 1),
      "a near-dup cluster straddled the split")
    // docs WITHOUT a cluster fall back to their own id — same fate as
    // the plain split, so unclustered data is unaffected by leak control
    val solo = Sampling.leakFreeSplit(corpus, clusters.limit(0), "doc_id", "graft", 80, 10)
      .select($"doc_id", $"split")
    val plain = Sampling.split(corpus, "doc_id", "graft", 80, 10)
      .select($"doc_id", $"split")
    assert(solo.exceptAll(plain).isEmpty)
  }
}
