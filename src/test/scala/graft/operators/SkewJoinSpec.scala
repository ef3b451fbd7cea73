package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin returns exactly the plain join's rows") {
    // one hot key (1) and a cold key (2)
    val left = (1 to 100).map(i => (1L, i)).toDF("k", "v")
      .unionByName(Seq((2L, 0), (3L, 9)).toDF("k", "v"))
    val right = Seq((1L, "hot"), (2L, "cold")).toDF("k", "label")
    val salted = SkewJoin.saltedJoin(left, right, Seq("k"), saltBuckets = 4,
      hotThreshold = 10L)
      .select("k", "v", "label")
    val plain = left.join(right, Seq("k")).select("k", "v", "label")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }

  test("only HOT right rows replicate; cold rows stay single") {
    val left = (1 to 100).map(i => (1L, i)).toDF("k", "v")
      .unionByName(Seq((2L, 0), (3L, 9)).toDF("k", "v"))
    val right = Seq((1L, "hot"), (2L, "cold"), (4L, "nomatch")).toDF("k", "label")
    val (l, r) = SkewJoin.saltedSides(left, right, Seq("k"),
      saltBuckets = 4, hotThreshold = 10L)
    // key 1 is hot (100 left rows ≥ 10): replicated 4×; keys 2/4 cold: 1×
    val byKey = r.groupBy("k").count().collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(byKey == Map(1L -> 4L, 2L -> 1L, 4L -> 1L))
    // hot left rows spread over >1 salt bucket; cold rows all salt 0
    assert(l.filter(col("k") === 1L).select("__salt").distinct().count() > 1)
    assert(l.filter(col("k") =!= 1L).select("__salt").distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(0))
  }

  test("salt actually spreads a hot key over multiple buckets") {
    val left = (1 to 100).map(i => (1L, i)).toDF("k", "v")
    val salted = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(4)).cast("int"))
    assert(salted.select("__salt").distinct().count() > 1)
  }
}
