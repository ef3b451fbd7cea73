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

  /** Word n-gram shingles of a document (distinct). */
  def shingles(textCol: Column, n: Int): Column = {
    val toks = tokens(textCol)
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
        .otherwise(array(concat_ws(" ", toks))))
  }

  /** MinHash signatures: k lexicographic-min seeded md5 values per doc.
    * One explode + one hash aggregate; signature width is fixed, so the
    * shuffled bytes per doc are O(k · 32), independent of doc length.
    */
  def minHashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        numHashes: Int, shingleN: Int): DataFrame = {
    val exploded = docs.select(col(idCol),
      explode(shingles(col(textCol), shingleN)).as("sh"))
    val aggs = (0 until numHashes).map(j =>
      min(md5(concat(lit(s"$j|"), col("sh")))).as(s"mh$j"))
    exploded.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash LSH candidate pairs: docs agreeing on at least one band.
    * Bands are md5(concat of rowsPerBand signature slots); the self-join
    * runs per (band index, band value) — the only shuffle keyed on band,
    * never on the full signature space.
    */
  def minHashPairs(docs: DataFrame, idCol: String, textCol: String,
                   numHashes: Int = 8, shingleN: Int = 3, rowsPerBand: Int = 2): DataFrame = {
    val sigs = minHashSignatures(docs, idCol, textCol, numHashes, shingleN)
    val numBands = numHashes / rowsPerBand
    val banded = sigs.select(col(idCol),
      explode(array((0 until numBands).map { b =>
        struct(lit(b).as("band"),
          md5(concat_ws("|", (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}")): _*)).as("sig"))
      }: _*)).as("bs"))
      .select(col(idCol), col("bs.band").as("band"), col("bs.sig").as("sig"))
    val a = banded.select(col(idCol).as("doc_a"), col("band"), col("sig"))
    val b = banded.select(col(idCol).as("doc_b"), col("band"), col("sig"))
    a.join(b, Seq("band", "sig"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_bands"))
  }

  /** 60-bit SimHash per doc: sign-sum of token-hash bits. The bit
    * tally is a single aggregate of 60 sums — map-side combinable,
    * constant state per doc.
    */
  def simHash(docs: DataFrame, idCol: String, textCol: String,
              bits: Int = 60): DataFrame = {
    val toks = docs.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .withColumn("h", hash60(col("tok")))
    val sums = (0 until bits).map(i =>
      sum(when(col("h").bitwiseAND(1L << i) =!= 0, 1).otherwise(-1)).as(s"b$i"))
    val tallies = toks.groupBy(col(idCol)).agg(sums.head, sums.tail: _*)
    tallies.select(col(idCol),
      (0 until bits).map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(0L))
        .reduce((a: Column, b: Column) => a + b).as("simhash"))
  }

  /** SimHash near-dup candidates: equal high-bit bucket, Hamming
    * distance ≤ maxHamming (native bit_count(xor)). The bucket prefix is
    * the LSH band — at scale the join shuffles only (bucket) groups.
    */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String,
                   bucketBits: Int = 16, maxHamming: Int = 8): DataFrame = {
    val sh = simHash(docs, idCol, textCol)
      .withColumn("bucket", shiftright(col("simhash"), 60 - bucketBits))
    val a = sh.select(col(idCol).as("doc_a"), col("simhash").as("sh_a"), col("bucket"))
    val b = sh.select(col(idCol).as("doc_b"), col("simhash").as("sh_b"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Exact n-gram Jaccard similarity over candidate pairs found through a
    * shared-shingle inverted index — never the cross product. Pairs
    * sharing no shingle have similarity 0 and are never materialized.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, minJaccard: Double = 0.3): DataFrame = {
    val sh = docs.select(col(idCol), explode(shingles(col(textCol), shingleN)).as("sh"))
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
    val a = sh.select(col(idCol).as("doc_a"), col("sh"))
    val b = sh.select(col(idCol).as("doc_b"), col("sh"))
    val inter = a.join(b, Seq("sh"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("n_sh", "n_a"), col("doc_a") === col(idCol)).drop(idCol)
      .join(sizes.withColumnRenamed("n_sh", "n_b"), col("doc_b") === col(idCol)).drop(idCol)
      .withColumn("jaccard",
        round(col("n_inter") / (col("n_a") + col("n_b") - col("n_inter")), 6))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("n_inter"), col("n_a"), col("n_b"), col("jaccard"))
  }
}
