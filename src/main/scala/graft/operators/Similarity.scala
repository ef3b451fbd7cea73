package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Vector math is native higher-order expressions in double precision —
  * `zip_with` + `aggregate` stay inside whole-stage codegen; no UDF, no
  * per-row allocation beyond the array scan.
  *
  * Scale shapes:
  *  - brute-force top-k: broadcast the query vector, map-side cosine,
  *    distributed TakeOrdered — the exact-search baseline.
  *  - sign-LSH bucket (IVF-style inverted lists): candidate generation
  *    shuffles only bucket groups; probing reads one bucket.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in double (left-to-right fold — portable). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Native codegen'd cosine ([[graft.plans.CosineSimilarity]] — one fused
    * loop, no per-row array allocation). Same left-to-right double
    * summation as [[cosine]], so results are bit-identical. Requires
    * [[graft.plans.GraftExtensions]] registered on the session.
    */
  def cosineNative(a: Column, b: Column): Column =
    call_function("cosine_sim", a, b)

  /** Deterministic sign-LSH bucket: bit j set iff vec(j) > 0. The scale
    * path's coarse quantizer — replace the sign planes with seeded random
    * hyperplanes for better balance; the plan shape is identical.
    */
  def signBucket(vec: Column, bits: Int): Column =
    (0 until bits).map(j =>
      when(element_at(vec, j + 1) > 0f, lit(1L << j)).otherwise(0L))
      .reduce((a: Column, b: Column) => a + b)

  /** Exact top-k cosine neighbors of one stored vector. The single query
    * row broadcasts; ordering is on the *rounded* score (+ id tiebreak) so
    * selection is stable across engines and fp noise.
    */
  def bruteForceTopK(embeddings: DataFrame, idCol: String, vecCol: String,
                     queryId: Long, k: Int): DataFrame = {
    graft.plans.GraftExtensions.register(embeddings.sparkSession)
    val query = embeddings.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__qvec"))
    embeddings.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(query))
      .select(col(idCol), round(cosineNative(col(vecCol), col("__qvec")), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** IVF-style approximate top-k: probe only the query's sign-LSH bucket. */
  def ivfTopK(embeddings: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int, bucketBits: Int): DataFrame = {
    graft.plans.GraftExtensions.register(embeddings.sparkSession)
    val bucketed = embeddings.withColumn("__bucket", signBucket(col(vecCol), bucketBits))
    val query = bucketed.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__qvec"), col("__bucket"))
    bucketed.join(broadcast(query), Seq("__bucket"))
      .filter(col(idCol) =!= queryId)
      .select(col(idCol), round(cosineNative(col(vecCol), col("__qvec")), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Int8-style vector quantization stats: per-vector scale
    * (127 / max|x|) and quantized-value summary. The quantized value is
    * floor(x · scale) — floor, not round, for engine-portable semantics.
    * At 100 TB quantization is the storage lever: 4× smaller embedding
    * columns with bounded recall loss.
    */
  def quantizeStats(embeddings: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val x = col(vecCol)
    val absMax = array_max(transform(x, v => abs(v.cast("double"))))
    val scale = lit(127.0) / absMax
    val q = transform(x, v => floor(v.cast("double") * scale).cast("long"))
    embeddings.select(
      col(idCol),
      round(scale, 6).as("scale"),
      aggregate(q, lit(0L), (acc, v) => acc + v).as("q_sum"),
      array_min(q).as("q_min"),
      array_max(q).as("q_max"))
  }

  /** Embedding near-duplicate pairs: sign-LSH bucket join + cosine
    * threshold. Never the cross product — candidates are per-bucket.
    */
  def cosinePairs(embeddings: DataFrame, idCol: String, vecCol: String,
                  bucketBits: Int, minCosine: Double): DataFrame = {
    graft.plans.GraftExtensions.register(embeddings.sparkSession)
    val bucketed = embeddings
      .select(col(idCol), col(vecCol), signBucket(col(vecCol), bucketBits).as("__bucket"))
      .localCheckpoint() // one signature materialization for both branches
      .repartition(col("__bucket"))
    val a = bucketed.select(col(idCol).as("vec_a"), col(vecCol).as("__va"), col("__bucket"))
    val b = bucketed.select(col(idCol).as("vec_b"), col(vecCol).as("__vb"), col("__bucket"))
    a.join(b, Seq("__bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(cosineNative(col("__va"), col("__vb")), 6).as("cos"))
      .filter(col("cos") >= minCosine)
  }
}
