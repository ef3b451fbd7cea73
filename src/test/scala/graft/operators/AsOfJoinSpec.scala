package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asOf picks the latest right row at-or-before each left time") {
    val left = Seq((1L, 10L), (1L, 20L), (1L, 35L), (2L, 10L)).toDF("k", "t")
    val right = Seq((1L, 5L, "a"), (1L, 20L, "b"), (1L, 30L, "c"), (2L, 50L, "z"))
      .toDF("k", "rt", "v")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("v"))
      .orderBy("k", "t").collect()
    // t=10 → a; t=20 → b (inclusive); t=35 → c; key 2 t=10 → no earlier row
    assert(out.map(r => Option(r.getAs[String]("v"))).toSeq ==
      Seq(Some("a"), Some("b"), Some("c"), None))
  }

  test("asOf preserves left columns and row count") {
    val left = Seq((1L, 10L, "keep")).toDF("k", "t", "extra")
    val right = Seq((1L, 1L, 9.9)).toDF("k", "rt", "v")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("v")).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("extra") == "keep")
    assert(out.head.getAs[Double]("v") == 9.9)
  }
}
