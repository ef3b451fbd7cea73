package graft.operators

import graft.SparkSpec

class RankingSpec extends SparkSpec
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark spark spark table table table table table table table"),
    (2L, "quantum table"),           // rare term, short doc
    (3L, "table table table table"), // no query terms
    (4L, "spark quantum table")      // both query terms
  ).toDF("doc_id", "text")

  test("bm25 ranks rare-term matches above common-term matches") {
    val out = Ranking.bm25(corpus, "doc_id", "text", Seq("spark", "quantum"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    // doc 3 has no query term: absent
    assert(!out.map(_._1).contains(3L))
    val scores = out.toMap
    // 'quantum' (df=2) carries more idf than 'spark' (df=2)… both df=2
    // here, but doc 4 matches BOTH terms and must beat doc 1 (one term,
    // higher tf but saturated) and doc 2 (one term)
    assert(out.head._1 == 4L, s"expected doc 4 first, got ${out.toSeq}")
    // tf saturation: doc 1's 3x'spark' beats nothing with 2 terms
    assert(scores(4L) > scores(1L) && scores(4L) > scores(2L))
    // every score positive, rounded to 6dp
    assert(out.forall { case (_, s) => s > 0 && (s * 1e6).round / 1e6 == s })
  }

  test("bm25 is stable under repartitioning (agg determinism)") {
    val a = Ranking.bm25(corpus, "doc_id", "text", Seq("spark", "quantum"))
      .collect().toSeq
    val b = Ranking.bm25(corpus.repartition(7), "doc_id", "text", Seq("spark", "quantum"))
      .collect().toSeq
    assert(a == b)
  }

  test("rrfHybrid fuses two rankings, absent legs contribute zero") {
    val lex = Seq((10L, 5.0), (11L, 4.0), (12L, 3.0)).toDF("doc_id", "s1")
    val vec = Seq((11L, 0.9), (13L, 0.8)).toDF("doc_id", "s2")
    val out = Ranking.rrfHybrid(lex, "s1", vec, "s2", "doc_id", kRrf = 60, k = 10)
      .collect()
    val byId = out.map(r => r.getLong(0) ->
      (Option(r.get(1)).map(_.asInstanceOf[Long]),
       Option(r.get(2)).map(_.asInstanceOf[Long]),
       r.getDouble(3))).toMap
    // doc 11 is in BOTH legs (rank 2 lex, rank 1 vec): must win
    assert(out.head.getLong(0) == 11L)
    assert(byId(11L)._1 == Some(2L) && byId(11L)._2 == Some(1L))
    // one-leg docs carry a null rank on the other leg and half the mass
    assert(byId(10L)._2.isEmpty && byId(13L)._1.isEmpty)
    assert(math.abs(byId(11L)._3 - (1.0 / 62 + 1.0 / 61)) < 1e-6)
    assert(math.abs(byId(10L)._3 - 1.0 / 61) < 1e-6)
  }

  test("temperatureMixtureStratified keeps the smallest cell whole") {
    val rows = (0 until 400).map { i =>
      val src = if (i % 4 == 0) "small" else "big"
      val lang = if (i % 2 == 0) "en" else "de"
      (i.toLong, src, lang)
    }
    val df = rows.toDF("id", "src", "lang")
    val out = Sampling.temperatureMixtureStratified(df, "id", Seq("src", "lang"),
      "seedx", alpha = 0.5)
    // output is a subset of the input
    assert(out.count() <= 400 && out.select("id").except(df.select("id")).isEmpty)
    val kept = out.groupBy("src", "lang").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // smallest cell = (small, en) with 100 rows (i%4==0 implies even i):
    // rate 10000 → all kept. (small, de) is empty by construction.
    assert(kept(("small", "en")) == 100L)
    // big cells (150 rows each) sample at floor(10000*sqrt(100/150)) →
    // strictly fewer than 150, more than 0
    assert(kept(("big", "en")) < 150L && kept(("big", "en")) > 0L)
    // deterministic: rerun identical
    val again = Sampling.temperatureMixtureStratified(df, "id", Seq("src", "lang"),
      "seedx", alpha = 0.5)
    assert(out.exceptAll(again).union(again.exceptAll(out)).isEmpty)
  }

  test("unigramScore: add-one smoothed known answers, OOV defined on foreign corpora") {
    import spark.implicits._
    // reference "a a b": counts a=2 b=1, total=3, V=2
    // P(a) = 3/6, P(b) = 2/6, P(oov) = 1/6
    val ref = Seq((0L, "a a b")).toDF("doc_id", "text")
    val toScore = Seq((1L, "a b"), (2L, "c"), (3L, "a a a")).toDF("doc_id", "text")
    val out = Ranking.unigramScore(toScore, ref, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out(0) == ((1L, 2L, r6((math.log(3.0 / 6) + math.log(2.0 / 6)) / 2))))
    assert(out(1) == ((2L, 1L, r6(math.log(1.0 / 6)))), "OOV must take the smoothed floor")
    assert(out(2) == ((3L, 3L, r6(math.log(3.0 / 6)))))
    // the in-vocabulary doc scores above the OOV doc — the filter signal
    assert(out(0)._3 > out(1)._3)
  }

  test("bpePairCounts: known answers, word-frequency weighting, single-char words dropped") {
    // "aab" ×3 (pairs aa, ab), "ab" ×1 (ab), "x" ×2 (no pair)
    val docs = Seq(
      (1L, "aab aab x"),
      (2L, "aab ab x")
    ).toDF("doc_id", "text")
    val out = Ranking.bpePairCounts(docs, "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // ab: 3 (from aab's word count) + 1 (from ab) = 4; aa: 3
    assert(out.toSeq == Seq(("ab", 4L), ("aa", 3L)))
  }

  test("bpePairCounts explodes the vocabulary, not the token stream") {
    // the plan must aggregate to distinct terms BEFORE generating pairs:
    // exactly 2 hash exchanges (term count, pair sum) and the Generate
    // sits above the first aggregate, not above the scan projection
    import org.apache.spark.sql.execution.GenerateExec
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    val docs = Seq((1L, "ab bc ab cd")).toDF("doc_id", "text")
    val df = Ranking.bpePairCounts(docs, "doc_id", "text")
    df.collect()
    val plan = df.queryExecution.executedPlan
    val gens = collectWithSubqueries(plan) { case g: GenerateExec => g }
    // one explode for tokens, one for pair positions
    assert(gens.length == 2, s"expected 2 Generates:\n$plan")
    val pairGen = gens.head // topmost Generate = pair positions
    val aggsBelow = pairGen.collect { case a: HashAggregateExec => a }
    assert(aggsBelow.nonEmpty,
      s"pair Generate must run above the vocabulary aggregate:\n$plan")
  }
}
