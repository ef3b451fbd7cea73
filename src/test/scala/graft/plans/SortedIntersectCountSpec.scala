package graft.plans

import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType}

import graft.SparkSpec

/** SortedIntersectCount: property test against size(array_intersect) on
  * random sorted-distinct long arrays — covering BOTH eval paths (the
  * interpreted `eval` and the whole-stage-codegen dataframe path).
  */
class SortedIntersectCountSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42) // deterministic
  private def randomSet(): Seq[Long] =
    Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong).distinct.sorted

  private val cases: Seq[(Seq[Long], Seq[Long])] =
    Seq.fill(200)((randomSet(), randomSet())) ++
      Seq((Seq.empty[Long], Seq(1L, 2L)), (Seq.empty[Long], Seq.empty[Long]),
        (Seq(1L), Seq(1L)))

  test("codegen path: sorted_intersect_count == size(array_intersect)") {
    graft.plans.GraftExtensions.register(spark)
    val df = cases.toDF("a", "b")
    val bad = df.select(
      call_function("sorted_intersect_count", col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(bad.isEmpty)
  }

  test("interpreted eval path matches") {
    val expr = SortedIntersectCount(
      BoundReference(0, ArrayType(LongType), nullable = true),
      BoundReference(1, ArrayType(LongType), nullable = true))
    for ((a, b) <- cases) {
      val row = new GenericInternalRow(Array[Any](
        new GenericArrayData(a.toArray), new GenericArrayData(b.toArray)))
      assert(expr.eval(row) == a.toSet.intersect(b.toSet).size.toLong,
        s"a=$a b=$b")
    }
    // null propagation
    val nullRow = new GenericInternalRow(Array[Any](null, new GenericArrayData(Array(1L))))
    assert(expr.eval(nullRow) == null)
  }
}
