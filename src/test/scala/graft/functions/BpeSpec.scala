package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.plans.GraftExtensions

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the Sennrich et al. '16 running example: low*5, lower*2, newest*6, widest*3
  private def corpus = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower"),
    (3L, "newest newest newest newest newest newest"),
    (4L, "widest widest widest")
  ).toDF("doc_id", "text")

  test("train learns the classic merge sequence deterministically") {
    val merges = Bpe.train(corpus, "text", numMerges = 4)
    // pair counts: (e,s)=9 ties (s,t)=9 → lexicographic; then (es,t)=9;
    // then (l,o)=7 ties (o,w)=7 → lexicographic; then (lo,w)=7
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    // training twice gives the identical list (full determinism)
    assert(Bpe.train(corpus, "text", 4) == merges)
  }

  test("train stops early when no pairs remain") {
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val merges = Bpe.train(tiny, "text", numMerges = 10)
    assert(merges == Seq(("a", "b"))) // after merging, the word is one symbol
  }

  test("encode applies merges by rank priority; OOV stays character-split") {
    GraftExtensions.register(spark)
    val merges = Bpe.train(corpus, "text", 4)
    val out = Seq((1L, "lowest newest xyz"))
      .toDF("id", "t")
      .repartition(4) // cross a shuffle so the expression ships to tasks
      .select(Bpe.encode(col("t"), merges).as("toks"))
      .collect()(0).getSeq[String](0)
    // lowest: l o w e s t → es → est → lo → low ⇒ [low, est]
    // newest: n e w est — (n,e)/(e,w)/(w,est) were never merged at 4 rules
    // xyz: no rules apply → single chars
    assert(out == Seq("low", "est", "n", "e", "w", "est", "x", "y", "z"))
  }

  test("encodeBroadcast ≡ encode (plan-literal) on the corpus, across a shuffle") {
    GraftExtensions.register(spark)
    val merges = Bpe.train(corpus, "text", 4)
    val df = corpus.unionByName(Seq((5L, "lowest xyz"), (6L, "")).toDF("doc_id", "text"))
      .repartition(4) // the broadcast handle must ship to real tasks
    val lit = df.select($"doc_id", Bpe.encode(col("text"), merges).as("toks"))
    val bc = df.select($"doc_id", Bpe.encodeBroadcast(spark, col("text"), merges).as("toks"))
    val diff = bc.exceptAll(lit).union(lit.exceptAll(bc))
    assert(diff.isEmpty, diff.collect().take(5).mkString(";"))
    // and the rules are NOT in the plan: a 50k-merge literal list would
    // render in the plan tree; the broadcast form shows only the handle
    assert(!bc.queryExecution.executedPlan.toString.contains("est"))
  }

  test("encode(train corpus) reproduces training's final symbol state; more merges, fewer tokens") {
    GraftExtensions.register(spark)
    def totalTokens(numMerges: Int): Long = {
      val merges = Bpe.train(corpus, "text", numMerges)
      corpus.select(size(Bpe.encode(col("text"), merges)).cast("long").as("n"))
        .agg(sum($"n")).collect()(0).getLong(0)
    }
    val t0 = totalTokens(0)   // pure characters
    val t4 = totalTokens(4)
    val t8 = totalTokens(8)
    assert(t0 > t4 && t4 > t8, s"$t0 / $t4 / $t8")
    // chars: low=3*5 + lower=5*2 + newest=6*6 + widest=6*3 = 79
    assert(t0 == 79L)
  }
}
