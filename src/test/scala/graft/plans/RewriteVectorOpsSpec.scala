package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

class RewriteVectorOpsSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
    (1L, Seq(0.5f, -1.5f, 2.5f), Seq(-2.0f, 0.25f, 8.0f))
  ).toDF("id", "a", "b")

  test("the declarative zip_with/aggregate dot product optimizes to vec_dot") {
    GraftExtensions.register(spark)
    // non-literal input — literal frames constant-fold to a LocalRelation
    // before the plan can be inspected
    val df = spark.range(4).select(
        transform(sequence(lit(1), lit(3)), i => (i + col("id")).cast("float")).as("a"),
        transform(sequence(lit(1), lit(3)), i => (i * 2 + col("id")).cast("float")).as("b"))
      .select(Similarity.dot(col("a"), col("b")).as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("vec_dot"), optimized)
    val first = df.orderBy(col("d")).collect().head.getDouble(0)
    assert(math.abs(first - 28.0) < 1e-12) // id=0: [1,2,3]·[2,4,6]
  }

  test("rewritten plan returns the same values as interpreted evaluation") {
    GraftExtensions.register(spark)
    val viaRule = vecs.select(col("id"), Similarity.dot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // direct native call, bypassing the rule
    val native = vecs.select(col("id"), call_function("vec_dot", col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaRule == native)
    assert(math.abs(viaRule(0L) - 32.0) < 1e-12) // 4 + 10 + 18
  }

  test("non-matching aggregates are left untouched") {
    val df = vecs.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x.cast("double") + y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("s"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("vec_dot"))
    assert(math.abs(df.collect().head.getDouble(0) - 21.0) < 1e-12)
  }
}
