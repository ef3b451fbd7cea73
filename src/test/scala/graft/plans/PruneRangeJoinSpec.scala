package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.AsOfJoin

/** PruneRangeJoin: a projection above the custom range-join node must
  * shrink both children (a custom node is otherwise a column-pruning
  * barrier).
  */
class PruneRangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def sides = {
    val left = Seq((1L, 100L, "a", 99.0, "junkL"), (1L, 200L, "b", 98.0, "junkL"))
      .toDF("k", "t", "lpayload", "lunused", "lunused2")
    val right = Seq((1L, 90L, 1.0, "junkR", 7L), (1L, 150L, 2.0, "junkR", 8L))
      .toDF("k", "rt", "v1", "runused", "v2")
    (left, right)
  }

  test("select over rangeJoinNative prunes unused columns out of both children") {
    val (left, right) = sides
    val joined = AsOfJoin.rangeJoinNative(left, right, Seq("k"), "t", "rt",
      valueCols = Seq("v1", "v2"), lowerUs = 50L, upperUs = 50L)
    val q = joined.select("k", "t", "v1")
    val nodes = q.queryExecution.optimizedPlan.collect { case n: RangeJoinNode => n }
    assert(nodes.length == 1)
    val n = nodes.head
    val leftCols = n.left.output.map(_.name).toSet
    val rightCols = n.right.output.map(_.name).toSet
    assert(!leftCols.contains("lunused") && !leftCols.contains("lunused2"), leftCols)
    assert(!rightCols.contains("runused") && !rightCols.contains("v2"), rightCols)
    assert(n.rightValues.map(_.name) == Seq("v1"))
    // the match-time column survives pruning (part of the output contract)
    assert(rightCols.contains("rt"))
    // and the pruned plan still computes the band semantics:
    // t=100 → [50,150] matches rt 90 and 150; t=200 → [150,250] matches 150
    val rows = q.orderBy("t", "v1").as[(Long, Long, Double)].collect().toSeq
    assert(rows == Seq((1L, 100L, 1.0), (1L, 100L, 2.0), (1L, 200L, 2.0)))
  }

  test("no projection → node untouched; full output still correct") {
    val (left, right) = sides
    val joined = AsOfJoin.rangeJoinNative(left, right, Seq("k"), "t", "rt",
      valueCols = Seq("v1", "v2"), lowerUs = 50L, upperUs = 50L)
    assert(joined.columns.toSeq ==
      Seq("k", "t", "lpayload", "lunused", "lunused2", "rt", "v1", "v2"))
    val r = joined.orderBy("t", "rt").select("t", "rt", "v2")
      .as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq((100L, 90L, 7L), (100L, 150L, 8L), (200L, 150L, 8L)))
  }
}
