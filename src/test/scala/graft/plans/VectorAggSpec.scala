package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorAggSpec extends SparkSpec {
  import spark.implicits._

  test("vec_mean averages element-wise across partitions (partial + merge)") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f)),
      (1L, Array(3.0f, 4.0f, 5.0f)),
      (2L, Array(10.0f, 20.0f, 30.0f))
    ).toDF("g", "v").repartition(4) // force map-side partials + exchange merge
    val out = df.groupBy($"g")
      .agg(call_function("vec_mean", $"v").as("c"), count($"v").as("n"))
      .orderBy($"g").collect()
    assert(out(0).getSeq[Double](1) === Seq(2.0, 3.0, 4.0))
    assert(out(0).getLong(2) == 2L)
    assert(out(1).getSeq[Double](1) === Seq(10.0, 20.0, 30.0))
  }

  test("vec_mean ignores null vectors, accepts array<double>, SQL-reachable") {
    val df = Seq(
      (1L, Some(Array(2.0, 4.0))),
      (1L, None),
      (1L, Some(Array(4.0, 8.0)))
    ).toDF("g", "v")
    df.createOrReplaceTempView("vm_in")
    val r = spark.sql("SELECT vec_mean(v) AS c FROM vm_in GROUP BY g").head()
    assert(r.getSeq[Double](0) === Seq(3.0, 6.0))
    // all-null group → null result
    val nul = Seq((1L, Option.empty[Array[Double]])).toDF("g", "v")
      .agg(call_function("vec_mean", $"v")).head()
    assert(nul.isNullAt(0))
  }

  test("vec_weighted_mean weights element-wise across partitions; ≡ vec_mean at w=1") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f), 1L),
      (1L, Array(4.0f, 8.0f), 3L),   // pulls the centroid 3× harder
      (2L, Array(10.0f, 20.0f), 5L)
    ).toDF("g", "v", "w").repartition(4)
    val out = df.groupBy($"g")
      .agg(call_function("vec_weighted_mean", $"v", $"w").as("c"), sum($"w").as("tw"))
      .orderBy($"g").collect()
    // g=1: (1*1 + 4*3)/4 = 3.25, (2*1 + 8*3)/4 = 6.5
    assert(out(0).getSeq[Double](1) === Seq(3.25, 6.5))
    assert(out(0).getLong(2) == 4L)
    assert(out(1).getSeq[Double](1) === Seq(10.0, 20.0))
    // uniform weights reduce to vec_mean, any numeric weight type
    val uni = df.groupBy($"g")
      .agg(call_function("vec_weighted_mean", $"v", lit(2.5)).as("c"))
    val mean = df.groupBy($"g").agg(call_function("vec_mean", $"v").as("c"))
    assert(uni.orderBy($"g").collect().map(_.getSeq[Double](1)).toSeq ==
      mean.orderBy($"g").collect().map(_.getSeq[Double](1)).toSeq)
  }

  test("vec_weighted_mean: null vec/weight rows skipped; zero total weight → null; SQL-reachable") {
    val df = Seq(
      (1L, Some(Array(2.0, 4.0)), Some(2.0)),
      (1L, None, Some(9.0)),               // null vector skipped
      (1L, Some(Array(8.0, 16.0)), None),  // null weight skipped
      (2L, Some(Array(1.0, 1.0)), Some(0.0))
    ).toDF("g", "v", "w")
    df.createOrReplaceTempView("vwm_in")
    val rows = spark.sql(
      "SELECT g, vec_weighted_mean(v, w) AS c FROM vwm_in GROUP BY g ORDER BY g").collect()
    assert(rows(0).getSeq[Double](1) === Seq(2.0, 4.0))
    assert(rows(1).isNullAt(1)) // Σw = 0
  }

  test("vec_mean fails loudly on ragged dimensions") {
    val df = Seq((1L, Array(1.0, 2.0)), (1L, Array(1.0, 2.0, 3.0))).toDF("g", "v")
    val e = intercept[Exception] {
      df.groupBy($"g").agg(call_function("vec_mean", $"v")).collect()
    }
    assert(e.getMessage != null)
  }

  test("vec_mean aggregates map-side: the exchange carries partial buffers") {
    val df = Seq((1L, Array(1.0f, 2.0f)), (1L, Array(3.0f, 4.0f))).toDF("g", "v")
      .repartition(3)
    val plan = df.groupBy($"g").agg(call_function("vec_mean", $"v"))
      .queryExecution.executedPlan.toString
    // partial aggregate BELOW the exchange, final above — the shape that
    // keeps shuffled bytes at groups × dim
    assert("(?i)partial_vec_mean|partial.*vec_mean".r.findFirstIn(plan).isDefined
      || plan.contains("partial"), plan.take(3000))
  }
}
