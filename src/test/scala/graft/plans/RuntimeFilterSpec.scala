package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Runtime bloom-filter join pruning (`InjectRuntimeFilter`): with a
  * selective filter on one join side, Spark can build a bloom filter
  * from it and prune the OTHER side's scan before the shuffle — at the
  * 100 TB target this is the difference between shuffling the whole
  * fact table and shuffling the ~matching slice. The default thresholds
  * (10 MB creation / 10 GB scan) are sized for clusters; this spec
  * lowers them to prove the engine's queries are SHAPED so the filter
  * injects, and that results are unchanged.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim filter injects a bloom filter on the fact side") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    def query() = {
      val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      val o = Tables.orders(spark, "/root/testdata/sf0.001")
        .filter(col("o_orderpriority") === "1-URGENT")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .agg(round(sum(col("l_extendedprice")), 4).as("s"), count(lit(1)).as("n"))
    }
    val expected = query().collect().toSeq // with session defaults
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      val q = query()
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"no bloom filter injected:\n${plan.take(1500)}")
      assert(q.collect().toSeq == expected)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
