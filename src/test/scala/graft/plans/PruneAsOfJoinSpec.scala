package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.AsOfJoin

/** PruneAsOfJoin: a projection above the custom as-of node must shrink
  * both children (a custom node is otherwise a column-pruning barrier).
  */
class PruneAsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def sides = {
    val left = Seq((1L, 10L, "a", 99.0, "junkL"), (1L, 20L, "b", 98.0, "junkL"))
      .toDF("k", "t", "lpayload", "lunused", "lunused2")
    val right = Seq((1L, 5L, 1.0, "junkR", 7L), (1L, 15L, 2.0, "junkR", 8L))
      .toDF("k", "rt", "v1", "runused", "v2")
    (left, right)
  }

  test("select over asOfNative prunes unused columns out of both children") {
    val (left, right) = sides
    val joined = AsOfJoin.asOfNative(left, right, Seq("k"), "t", "rt",
      valueCols = Seq("v1", "v2"))
    val q = joined.select("k", "t", "v1")
    val nodes = q.queryExecution.optimizedPlan.collect { case n: AsOfJoinNode => n }
    assert(nodes.length == 1)
    val n = nodes.head
    val leftCols = n.left.output.map(_.name).toSet
    val rightCols = n.right.output.map(_.name).toSet
    assert(!leftCols.contains("lunused") && !leftCols.contains("lunused2"), leftCols)
    assert(!rightCols.contains("runused") && !rightCols.contains("v2"), rightCols)
    assert(n.rightValues.map(_.name) == Seq("v1"))
    // and the pruned plan still computes the as-of semantics
    val rows = q.orderBy("t").as[(Long, Long, Double)].collect().toSeq
    assert(rows == Seq((1L, 10L, 1.0), (1L, 20L, 2.0)))
  }

  test("no projection → node untouched; full output still correct") {
    val (left, right) = sides
    val joined = AsOfJoin.asOfNative(left, right, Seq("k"), "t", "rt",
      valueCols = Seq("v1", "v2"))
    assert(joined.columns.toSeq ==
      Seq("k", "t", "lpayload", "lunused", "lunused2", "v1", "v2"))
    val r = joined.orderBy("t").select("t", "v1", "v2").as[(Long, Double, Long)].collect().toSeq
    assert(r == Seq((10L, 1.0, 7L), (20L, 2.0, 8L)))
  }
}
