package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Lexical relevance scoring and rank fusion — the retrieval half of a
  * curation stack. The reference serves scene lookups from a metadata
  * store (detect_scenes.py:162-171 writes scene rows to DynamoDB for
  * later search); a Spark-native engine serves the same need as scoring
  * operators over the corpus itself, composable with the vector side
  * ([[Similarity]]) for hybrid retrieval.
  */
object Ranking {

  /** Okapi BM25 (Robertson/Sparck Jones probabilistic relevance; the
    * log(1 + (N-df+0.5)/(df+0.5)) idf variant that keeps scores
    * non-negative) of every document against a small bag of query terms.
    *
    * Shape at 100 TB: ONE aggregate over the exploded token stream
    * computes per-doc length AND the per-query-term term frequencies as
    * conditional sums — map-side combined, one doc-keyed shuffle, no
    * (doc, term) pair table for a handful of query terms. Corpus
    * statistics (N, avgdl, per-term df) reduce to ONE row broadcast to
    * the scoring projection, and top-k plans as TakeOrdered — no global
    * sort. Scores round to 6dp before ranking so downstream rank
    * consumers are reproducible across engines.
    */
  /** Corpus-trained UNIGRAM language-model score per document — the
    * cheap perplexity-style quality signal of curation stacks (CCNet
    * filters CommonCrawl on an LM's per-token logprob; a unigram model
    * over the reference corpus is its one-shuffle approximation).
    * Returns (id, n_tokens, avg_logprob) with avg_logprob =
    * mean over tokens of ln P(token), add-one smoothed so scoring a
    * corpus the model never saw is defined:
    * P(t) = (count(t) + 1) / (total + |V| + 1).
    *
    * Shape at 100 TB: the model IS a (token, logprob) table — one
    * aggregate over the reference corpus's exploded tokens — and
    * scoring is explode → join (AQE broadcasts a small vocabulary) →
    * per-doc average. Both passes are plain hash aggregates; nothing
    * driver-side. Train once, score any corpus.
    */
  def unigramScore(score: DataFrame, reference: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    val refToks = reference.select(
      explode(TextFunctions.tokens(col(textCol))).as("__tok"))
    val counts = refToks.groupBy(col("__tok")).agg(count(lit(1)).as("__c"))
    // ONE row of corpus constants: total tokens + vocabulary size
    val stats = counts.agg(sum(col("__c")).as("__total"),
      count(lit(1)).as("__v"))
    val model = counts.crossJoin(broadcast(stats))
      .select(col("__tok"),
        log((col("__c") + 1L) / (col("__total") + col("__v") + 1L).cast("double"))
          .as("__lp"))
    val oov = log(lit(1.0) / (col("__total") + col("__v") + 1L).cast("double"))
    val docToks = score.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("__tok"))
    docToks
      .join(model, Seq("__tok"), "left")
      .crossJoin(broadcast(stats))
      .select(col(idCol), coalesce(col("__lp"), oov).as("__lp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(col("__lp")), 6).as("avg_logprob"))
  }

  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
           k: Int = 10): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    require(queryTerms.distinct == queryTerms, s"duplicate query terms: $queryTerms")
    val toks = docs.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("__term"))
    val tfCols = queryTerms.zipWithIndex.map { case (t, i) =>
      sum(when(col("__term") === t, 1L).otherwise(0L)).as(s"__tf$i")
    }
    // materialize the per-doc table ONCE before it branches: it feeds
    // both the corpus-stats aggregate and the scoring projection, and
    // without the barrier Catalyst duplicates the whole scan→explode→agg
    // subtree into each branch — two corpus passes instead of one (the
    // same two-consumer trap q_tfidf's term table documents). The
    // materialized table is ndocs × (2 + |terms|) numbers — the per-doc
    // stats table you would persist anyway at 100 TB.
    val perDoc = Dedup.materialize(
      toks.groupBy(col(idCol)).agg(count(lit(1)).as("__dl"), tfCols: _*), None)
    val statAggs =
      count(lit(1)).cast("double").as("__nd") +:
      avg(col("__dl")).as("__avgdl") +:
      queryTerms.indices.map(i =>
        sum(when(col(s"__tf$i") > 0, 1L).otherwise(0L)).cast("double").as(s"__df$i"))
    val stats = perDoc.agg(statAggs.head, statAggs.tail: _*)
    // per-term contribution; a zero tf contributes exactly 0.0, so the
    // sum only needs the match filter for output pruning, not correctness
    val score = queryTerms.indices.map { i =>
      val tf = col(s"__tf$i")
      val df = col(s"__df$i")
      val idf = log(lit(1.0) + (col("__nd") - df + lit(0.5)) / (df + lit(0.5)))
      idf * (tf * lit(k1 + 1)) /
        (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("__dl") / col("__avgdl")))
    }.reduce(_ + _)
    perDoc.crossJoin(broadcast(stats))
      .filter(queryTerms.indices.map(i => col(s"__tf$i") > 0).reduce(_ || _))
      .select(col(idCol), round(score, 6).as("bm25"))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR'09) of a
    * lexical and a vector ranking: rrf(d) = Σ_r 1/(kRrf + rank_r(d)),
    * absent-from-a-ranking contributes 0. The standard way to combine
    * BM25 and embedding retrieval without score calibration.
    *
    * Inputs are ALREADY-REDUCED top-N lists (each ≤ a few hundred rows
    * from [[bm25]] / [[Similarity.bruteForceTopK]]), so the
    * single-partition row_number window here is over driver-scale data
    * by construction — the corpus-scale work happened inside the legs.
    * Ranks derive from the legs' 6dp-rounded scores with id tie-breaks,
    * so they are reproducible across engines.
    */
  def rrfHybrid(lexTop: DataFrame, lexScoreCol: String,
                vecTop: DataFrame, vecScoreCol: String,
                idCol: String, kRrf: Int = 60, k: Int = 10): DataFrame = {
    def ranked(df: DataFrame, scoreCol: String, rankName: String) = {
      val w = Window.orderBy(col(scoreCol).desc, col(idCol))
      df.select(col(idCol), row_number().over(w).cast("long").as(rankName))
    }
    val lex = ranked(lexTop, lexScoreCol, "rank_lex")
    val vec = ranked(vecTop, vecScoreCol, "rank_vec")
    lex.join(vec, Seq(idCol), "full_outer")
      .select(col(idCol), col("rank_lex"), col("rank_vec"),
        round(
          coalesce(lit(1.0) / (lit(kRrf) + col("rank_lex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf) + col("rank_vec")), lit(0.0)), 6).as("rrf"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(k)
  }

  /** Adjacent symbol-PAIR counts over the corpus — the statistic the
    * first BPE merge maximizes (Sennrich et al. '16 train tokenizers by
    * repeatedly merging the most frequent adjacent pair). Returns the
    * `topK` (pair, n) rows, n = occurrences weighted by word frequency,
    * ordered (n desc, pair) so the cutoff is deterministic.
    *
    * Shape at 100 TB: the corpus collapses to its VOCABULARY first
    * (groupBy term → count, map-side combined — the same first shuffle
    * q_vocab pays), and pair generation runs over distinct words only,
    * weighted by their counts: the expensive explode touches |V| rows,
    * not corpus tokens. Pairs come from builtin sequence+substr — pure
    * codegen, no UDF; single-char words can't form a pair and are
    * filtered BEFORE the explode (sequence(1,0) would descend).
    */
  def bpePairCounts(docs: DataFrame, idCol: String, textCol: String,
                    topK: Int = 100): DataFrame =
    docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("wn"))
      .filter(length(col("term")) >= 2)
      .select(col("wn"), explode(sequence(lit(1), length(col("term")) - 1)).as("i"),
        col("term"))
      .select(col("term").substr(col("i"), lit(2)).as("pair"), col("wn"))
      .groupBy(col("pair")).agg(sum(col("wn")).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(topK)
}
