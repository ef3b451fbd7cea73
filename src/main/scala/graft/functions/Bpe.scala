package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenizer TRAINING (Sennrich et al. '16) — completes the
  * tokenizer-build family: `q_vocab` is the word-count first pass,
  * `q_bpe_pairs` the pair-statistic, this learns the merge-rule list,
  * and [[graft.plans.BpeEncode]] applies it corpus-wide.
  *
  * Shape at 100 TB: the ONLY corpus-scale pass is the distributed
  * word count (one map-side-combined shuffle — the q_vocab shape);
  * the merge loop then runs on the collected VOCABULARY, which is how
  * production tokenizer trainers work (the vocab is orders of magnitude
  * smaller than the corpus; `maxWords` caps it deterministically by
  * (count desc, word) for pathological corpora). Ties on pair frequency
  * break to the lexicographically smallest pair, so training is fully
  * deterministic.
  */
object Bpe {

  /** Learn `numMerges` merge rules from the corpus. Returns the ordered
    * rule list — order IS priority for [[graft.plans.BpeEncode]].
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 1000000): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    val vocab: Array[(Array[String], Long)] = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0).map(_.toString).toArray, r.getLong(1)))

    val words = vocab.map(_._1.clone())
    val counts = vocab.map(_._2)
    val merges = Seq.newBuilder[(String, String)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var wi = 0
      while (wi < words.length) {
        val w = words(wi)
        var i = 0
        while (i < w.length - 1) {
          val p = (w(i), w(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + counts(wi))
          i += 1
        }
        wi += 1
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        // max count, ties to the lexicographically smallest pair
        val best = pairCounts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        val joined = best._1 + best._2
        wi = 0
        while (wi < words.length) {
          val w = words(wi)
          if (w.length > 1) {
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < w.length) {
              if (i < w.length - 1 && w(i) == best._1 && w(i + 1) == best._2) {
                out += joined; i += 2
              } else { out += w(i); i += 1 }
            }
            words(wi) = out.toArray
          }
          wi += 1
        }
        m += 1
      }
    }
    merges.result()
  }

  /** Column form of the distributed apply ([[graft.plans.BpeEncode]]);
    * requires `GraftExtensions.register` on the session. The rules ride
    * as plan literals — map-side, no rules-table join.
    */
  def encode(text: Column, merges: Seq[(String, String)]): Column =
    call_function("bpe_encode", text,
      typedlit(merges.map(_._1)), typedlit(merges.map(_._2)))

  /** [[encode]] with the rules BROADCAST instead of inlined into the
    * plan: the production path for real vocabularies (tens of thousands
    * of merges — megabytes that a plan literal would re-serialize into
    * every stage's task binary and blow past codegen limits). The
    * broadcast ships once per executor and is shared by every query
    * holding the returned Column. Same output, spec-pinned.
    */
  def encodeBroadcast(spark: org.apache.spark.sql.SparkSession,
                      text: Column, merges: Seq[(String, String)]): Column = {
    val bc = spark.sparkContext.broadcast(merges.toArray)
    org.apache.spark.sql.graftbridge.GraftShim.column(
      graft.plans.BpeEncodeBroadcast(
        org.apache.spark.sql.graftbridge.GraftShim.expression(text), bc))
  }
}
