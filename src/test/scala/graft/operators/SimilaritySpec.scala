package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),   // identical to query
    (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),   // orthogonal
    (3L, Seq(-1.0f, 0.0f, 0.0f, 0.0f)),  // opposite
    (4L, Seq(1.0f, 1.0f, 0.0f, 0.0f))    // 45 degrees
  ).toDF("vec_id", "embedding")

  test("cosine: identical→1, orthogonal→0, opposite→-1") {
    val c = vecs.filter(col("vec_id") =!= 0)
      .crossJoin(vecs.filter(col("vec_id") === 0).select(col("embedding").as("q")))
      .select(col("vec_id"), round(Similarity.cosine(col("embedding"), col("q")), 6).as("cos"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos")).toMap
    assert(c(1L) == 1.0 && c(2L) == 0.0 && c(3L) == -1.0)
    assert(math.abs(c(4L) - 0.707107) < 1e-6)
  }

  test("native cosine_sim expression is bit-identical to the HOF fold") {
    graft.plans.GraftExtensions.register(spark)
    val pairs = vecs.select(col("embedding").as("a"))
      .crossJoin(vecs.select(col("embedding").as("b")))
    val diffs = pairs.select(
      Similarity.cosine(col("a"), col("b")).as("hof"),
      Similarity.cosineNative(col("a"), col("b")).as("native"))
      .filter(col("hof") =!= col("native"))
    assert(diffs.count() == 0)
  }

  test("bruteForceTopK ranks by cosine desc, excludes the query") {
    val top = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", 0L, 3)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(top == Seq(1L, 4L, 2L))
  }

  test("ivfTopK only probes the query's sign bucket") {
    val top = Similarity.ivfTopK(vecs, "vec_id", "embedding", 0L, 10, bucketBits = 2)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    // bucket(query) = bit0 set (dim1>0), bit1 unset → ids 1 (same bucket); 4 has both bits
    assert(top == Seq(1L))
  }

  test("cosinePairs honors the bucket boundary and threshold") {
    val pairs = Similarity.cosinePairs(vecs, "vec_id", "embedding",
      bucketBits = 2, minCosine = 0.9)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(pairs == Set((0L, 1L))) // 0-1 identical and same bucket
  }
}
