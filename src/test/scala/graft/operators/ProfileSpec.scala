package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile: nulls, exact distincts, natural-order min/max in ONE pass") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "b"), (2L, null), (10L, "a"), (10L, "a"), (null, "c"))
      .toDF("id", "tag")
    val out = Profile.profile(df, Seq("id", "tag"))
      .orderBy("col_name").collect()
    val id = out(0); val tag = out(1)
    assert(id.getString(0) === "id")
    assert(id.getLong(1) === 1L)      // one null id
    assert(id.getLong(2) === 3L)      // 1, 2, 10
    // cast-AFTER-min: numeric min is 1 and max is 10 — min-of-cast would
    // have said max "2" ("10" < "2" lexicographically)
    assert((id.getString(3), id.getString(4)) === ("1", "10"))
    assert((tag.getLong(1), tag.getLong(2)) === (1L, 3L))
    assert((tag.getString(3), tag.getString(4)) === ("a", "c"))
  }

  test("approx profile drops the Expand entirely — sketches, not distinct values, cross the exchange") {
    val df = spark.range(0, 1000).toDF("id").withColumn("tag", concat(lit("t"), col("id") % 7))
    val out = Profile.profile(df, Seq("id", "tag"), exactDistinct = false)
      .orderBy("col_name").collect()
    // HLL++ is exact at these cardinalities' low end and tight at 1000
    assert(out(1).getLong(2) === 7L)
    assert(math.abs(out(0).getLong(2) - 1000L) <= 50L)
    val plan = Profile.profile(df, Seq("id", "tag"), exactDistinct = false)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan.take(2000))
  }

  test("profile is a single aggregate scan (one Expand-sharing agg, not one scan per column)") {
    val df = Seq((1L, "x")).toDF("id", "tag")
    val plan = Profile.profile(df, Seq("id", "tag")).queryExecution.executedPlan.toString
    // the multi-distinct strategy plans ONE Expand over ONE scan
    assert("(?i)LocalTableScan|Scan".r.findAllIn(plan).nonEmpty)
    assert("(?i)Expand".r.findAllIn(plan).length <= 1, plan.take(3000))
  }
}
