package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Deduplication operators for training-data curation: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard. Designed for the 100 TB shape:
  * everything before the (small) candidate-pair join is map-side or a
  * single hash aggregate; no operator ever forms the full cross product.
  *
  * All hashing is md5-derived (SURVEY §4) so every stage is replicable in
  * the DuckDB oracle — MinHash signatures are lexicographic minima of
  * seeded md5 strings, SimHash uses 60-bit md5-prefix integers.
  */
object Dedup {

  /** Exact dedup on normalized-content fingerprint: one row per distinct
    * content, keeping the smallest id (deterministic representative).
    * Single hash aggregate — the canonical 100 TB exact-dedup plan.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Word n-gram shingles from an already-materialized token array
    * (distinct). Callers must bind the token array to a named column
    * first: inlining `tokens(text)` here would copy the regex+split tree
    * into every lambda reference — measured 30× codegen-compile cost.
    */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
        .otherwise(array(concat_ws(" ", toks))))

  /** (doc_id, shingle) pairs, one row per distinct shingle per doc. */
  def explodedShingles(docs: DataFrame, idCol: String, textCol: String,
                       n: Int): DataFrame =
    docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), explode(shinglesFromTokens(col("__toks"), n)).as("sh"))

  /** MinHash signatures: k lexicographic-min seeded md5 values per doc,
    * computed MAP-SIDE by [[graft.plans.MinHashSlots]] in one pass over
    * the shingle array — zero shuffle (the aggregate formulation explodes
    * every shingle and shuffles (doc, shingle) rows; the md5 work is
    * identical, only the exchange disappears).
    */
  def minHashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        numHashes: Int, shingleN: Int): DataFrame = {
    graft.plans.GraftExtensions.register(docs.sparkSession)
    docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), shinglesFromTokens(col("__toks"), shingleN).as("__sh"))
      .select(col(idCol),
        call_function("minhash_slots", col("__sh"), lit(numHashes)).as("__slots"))
      .select(col(idCol) +: (0 until numHashes).map(j =>
        element_at(col("__slots"), j + 1).as(s"mh$j")): _*)
  }

  /** MinHash LSH candidate pairs: docs agreeing on at least one band.
    * Bands are md5(concat of rowsPerBand signature slots); the self-join
    * runs per (band index, band value) — the only shuffle keyed on band,
    * never on the full signature space.
    */
  /** @param maxBucketSize skip degenerate buckets with more members than
    *   this: a bucket of m docs yields m² candidate pairs, so one
    *   boilerplate-text bucket can dominate the whole join at scale. The
    *   standard LSH-dedup guard; skipped buckets are (deterministically)
    *   not candidates.
    */
  def minHashPairs(docs: DataFrame, idCol: String, textCol: String,
                   numHashes: Int = 8, shingleN: Int = 3, rowsPerBand: Int = 2,
                   maxBucketSize: Int = 64): DataFrame = {
    val sigs = minHashSignatures(docs, idCol, textCol, numHashes, shingleN)
    val numBands = numHashes / rowsPerBand
    val banded = sigs.select(col(idCol),
      explode(array((0 until numBands).map { b =>
        struct(lit(b).as("band"),
          md5(concat_ws("|", (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}")): _*)).as("sig"))
      }: _*)).as("bs"))
      .select(col(idCol), col("bs.band").as("band"), col("bs.sig").as("sig"))
      .withColumn("__bsize", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("sig"))))
      .filter(col("__bsize") <= maxBucketSize)
      .drop("__bsize")
    // repartition BEFORE aliasing: both self-join branches then hang off
    // an identical Exchange subtree → ReusedExchange computes the banded
    // signatures once, and the join needs no further shuffle
    val common = banded.repartition(col("band"), col("sig"))
    val a = common.select(col(idCol).as("doc_a"), col("band"), col("sig"))
    val b = common.select(col(idCol).as("doc_b"), col("band"), col("sig"))
    a.join(b, Seq("band", "sig"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_bands"))
  }

  /** 60-bit SimHash per doc: sign-sum of token-hash bits.
    *
    * Computed entirely MAP-SIDE: token md5s are materialized once per row
    * as an array, then each bit's tally is a codegen'd filter/size over
    * that array. No explode, no shuffle — a pure projection that scales
    * with input splits, vs. the textbook explode + 60-column groupBy
    * which shuffles every token.
    */
  def simHash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.plans.GraftExtensions.register(docs.sparkSession)
    docs
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), transform(col("__toks"), t => hash60(t)).as("__hs"))
      .select(col(idCol), call_function("simhash_bits", col("__hs")).as("simhash"))
  }

  /** SimHash near-dup candidates: equal high-bit bucket, Hamming
    * distance ≤ maxHamming (native bit_count(xor)). The bucket prefix is
    * the LSH band — at scale the join shuffles only (bucket) groups.
    */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String,
                   bucketBits: Int = 16, maxHamming: Int = 8): DataFrame = {
    // repartition before aliasing → one shared Exchange computes the
    // signatures; both join branches reuse it (see minHashPairs)
    val sh = simHash(docs, idCol, textCol)
      .withColumn("bucket", shiftright(col("simhash"), 60 - bucketBits))
      .repartition(col("bucket"))
    val a = sh.select(col(idCol).as("doc_a"), col("simhash").as("sh_a"), col("bucket"))
    val b = sh.select(col(idCol).as("doc_b"), col("simhash").as("sh_b"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Exact n-gram Jaccard similarity via PREFIX FILTERING (Bayardo et al.,
    * WWW'07; Chaudhuri et al., ICDE'06): order each doc's shingles by
    * ascending global document frequency and join only the first
    * n − ⌈t·n⌉ + 1 of them — any pair with J ≥ t must collide inside
    * those prefixes, so the result is EXACTLY the naive inverted-index
    * join, but the join runs on the rarest shingles instead of the
    * stop-shingles that dominate its cost. Exact intersections are then
    * computed only for surviving candidates.
    *
    * At 100 TB this is the difference between a join keyed on
    * power-law-hot shingles (quadratic in the hottest key) and one keyed
    * on the frequency tail.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, minJaccard: Double = 0.3): DataFrame = {
    val sh = explodedShingles(docs, idCol, textCol, shingleN)
    val df = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    // canonical order: (df asc, shingle asc) — a global total order.
    // One groupBy materializes each doc's df-sorted shingle list: the
    // prefix is a slice, the verification set comes for free (no
    // analytic windows, no second pass over the shingle pipeline).
    val byDoc = sh.join(df, "sh")
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("df"), col("sh")))).as("sorted"))
      .withColumn("n_sh", size(col("sorted")))
      .withColumn("prefix_len",
        (col("n_sh") - ceil(lit(minJaccard) * col("n_sh")) + 1).cast("int"))
      .select(col(idCol),
        expr("transform(slice(sorted, 1, prefix_len), x -> x.sh)").as("pref"),
        expr("transform(sorted, x -> x.sh)").as("shs"),
        col("n_sh"))
    val prefix = byDoc.select(col(idCol), explode(col("pref")).as("sh"))
      .repartition(col("sh")) // shared Exchange for both self-join branches
    val cand = prefix.select(col(idCol).as("doc_a"), col("sh"))
      .join(prefix.select(col(idCol).as("doc_b"), col("sh")), Seq("sh"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    val sets = byDoc.select(col(idCol), col("shs"), col("n_sh"))
    cand
      .join(sets.select(col(idCol).as("doc_a"), col("shs").as("shs_a"), col("n_sh").as("n_a")), "doc_a")
      .join(sets.select(col(idCol).as("doc_b"), col("shs").as("shs_b"), col("n_sh").as("n_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("shs_a"), col("shs_b"))).cast("long").as("n_inter"),
        col("n_a").cast("long").as("n_a"),
        col("n_b").cast("long").as("n_b"))
      .withColumn("jaccard",
        round(col("n_inter") / (col("n_a") + col("n_b") - col("n_inter")), 6))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("n_inter"), col("n_a"), col("n_b"), col("jaccard"))
  }
}
