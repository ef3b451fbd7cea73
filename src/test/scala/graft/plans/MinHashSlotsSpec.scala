package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions
import graft.operators.Dedup
import graft.sources.Tables

/** MinHashSlots: the native one-pass kernel must equal the declarative
  * formulation — explode shingles, hash60 % p, k Carter–Wegman
  * permutations, min per slot — on real documents. This cross-checks the
  * native expression against Spark's own arithmetic (the DuckDB oracle
  * checks it against a third engine).
  */
class MinHashSlotsSpec extends SparkSpec {

  test("native slots == declarative explode/groupBy formulation (sf0.001)") {
    import MinHashSlots.{coeffA, coeffB, Prime}
    val k = 8
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val native = Dedup.minHashSignatures(docs, "doc_id", "text",
      numHashes = k, shingleN = 3)
    val hm = pmod(TextFunctions.hash60(col("sh")), lit(Prime))
    val declarative = Dedup.explodedShingles(docs, "doc_id", "text", 3)
      .select(col("doc_id"), hm.as("hm"))
      .groupBy(col("doc_id"))
      .agg(
        min(pmod(col("hm") * coeffA(0) + coeffB(0), lit(Prime))).as("mh0"),
        (1 until k).map(j =>
          min(pmod(col("hm") * coeffA(j) + coeffB(j), lit(Prime))).as(s"mh$j")): _*)
    assert(native.exceptAll(declarative).union(declarative.exceptAll(native)).isEmpty)
    assert(native.count() == docs.count())
  }

  test("fused token-shingle kernel == shingle-array + minhash_slots composition") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val k = 8
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
      // short-doc edge: texts whose token count drops below shingleN
      .union(Seq((90001L, "one two"), (90002L, "")).toDF("doc_id", "text"))
    val fused = Dedup.minHashSignatures(docs, "doc_id", "text", k, 3)
    val composed = docs
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("__toks"))
      .select(col("doc_id"),
        Dedup.shinglesFromTokens(col("__toks"), 3).as("__sh"))
      .select(col("doc_id"),
        call_function("minhash_slots", col("__sh"), lit(k)).as("__slots"))
      .select(col("doc_id") +: (0 until k).map(j =>
        element_at(col("__slots"), j + 1).as(s"mh$j")): _*)
    assert(fused.exceptAll(composed).union(composed.exceptAll(fused)).isEmpty)
  }
}
