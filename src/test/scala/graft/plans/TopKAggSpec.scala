package graft.plans

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Analytics

class TopKAggSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  test("top_k ≡ window row_number form on real data (sf0.001)") {
    val orders = graft.sources.Tables.orders(spark, "/root/testdata/sf0.001")
    val agg = Analytics.topNPerGroupAgg(orders, 5)
      .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice").collect()
    // window form tie-breaks ASC on orderkey, the heap DESC — align the
    // window side for the comparison (tie on totalprice is absent in the
    // data iff the two agree; this asserts that directly)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").desc)
    val win = orders
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_orderpriority", "rn").collect()
    assert(agg.length == win.length && agg.length == 25)
    agg.zip(win).foreach { case (a, b) => assert(a == b) }
  }

  test("top_k runs as a PARTIAL hash aggregate — map-side combine before ONE exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
    val orders = graft.sources.Tables.orders(spark, "/root/testdata/sf0.001")
    val df = Analytics.topNPerGroupAgg(orders, 5)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val aggs = collectWithSubqueries(plan) { case a: ObjectHashAggregateExec => a }
    assert(aggs.length == 2, s"expected partial+final ObjectHashAggregate:\n$plan")
    // the terminal orderBy legitimately range-partitions; the aggregation
    // itself must contribute exactly ONE hash exchange (groups·k rows)
    val ex = collectWithSubqueries(plan) { case e: ShuffleExchangeExec => e }
      .filter(_.outputPartitioning.isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning])
    assert(ex.length == 1, s"expected exactly one hash exchange (groups·k rows):\n$plan")
  }

  test("top_k keeps k largest with struct tie-break, skips null ord, keeps null payloads") {
    GraftExtensions.register(spark)
    val df = Seq(
      ("g", Some(3.0), Some("a")),
      ("g", Some(3.0), Some("b")),   // tie on score → larger payload-key wins order
      ("g", Some(9.0), None),        // null payload is kept
      ("g", None, Some("x")),        // null FIELD in the ord struct sorts
                                     // smallest — participates and loses
      ("g", Some(1.0), Some("low")),
      ("h", Some(5.0), Some("only"))
    ).toDF("g", "score", "tag")
    val out = df.groupBy($"g")
      .agg(call_function("top_k", struct($"score", $"tag"), $"tag", lit(2)).as("tk"))
      .select($"g", posexplode($"tk"))
      .select($"g", $"pos", $"col.val".as("tag"), $"col.ord.score".as("score"))
      .orderBy($"g", $"pos")
      .collect().map(r => (r.getString(0), r.getInt(1),
        Option(r.getString(2)).orNull, r.getDouble(3)))
    // g: 9.0/null beats 3.0/b beats 3.0/a (null tag sorts FIRST in struct
    // ordering ascending → last descending… struct ties break on tag desc)
    assert(out.toSeq == Seq(
      ("g", 0, null, 9.0), ("g", 1, "b", 3.0), ("h", 0, "only", 5.0)))
  }

  test("top_k: groups smaller than k return all rows descending; null ord rows are skipped") {
    GraftExtensions.register(spark)
    val df = Seq((1, Some(10L)), (1, Some(30L)), (1, None), (2, Some(7L)))
      .toDF("g", "v")
    val out = df.groupBy($"g")
      .agg(call_function("top_k", $"v", $"v", lit(5)).as("tk"))
      .select($"g", $"tk.ord".as("ords"))
      .orderBy($"g").collect()
      .map(r => (r.getInt(0), r.getSeq[Long](1)))
    assert(out.toSeq == Seq((1, Seq(30L, 10L)), (2, Seq(7L))))
  }

  test("property: top_k ≡ window row_number form on random tables (ties, nulls, sub-k groups)") {
    val rnd = new scala.util.Random(13) // deterministic
    (1 to 6).foreach { round =>
      val n = 50 + rnd.nextInt(150)
      val k = 1 + rnd.nextInt(4)
      // small value space forces ORD TIES (broken by id via the struct);
      // null v inside the struct sorts SMALLEST (the struct itself is
      // non-null, so the row still participates — last in descending
      // order), mirrored by desc_nulls_last on the window side
      val rows = (0 until n).map { i =>
        (rnd.nextInt(7).toLong,
          if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(5).toDouble),
          i.toLong)
      }
      val df = rows.toDF("g", "v", "id")
      GraftExtensions.register(spark)
      val agg = df.groupBy($"g")
        .agg(call_function("top_k", struct($"v", $"id"), $"id", lit(k)).as("tk"))
        .select($"g", posexplode($"tk"))
        .select($"g", (col("pos") + 1).cast("long").as("rn"), $"col.val".as("id"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"g").orderBy($"v".desc_nulls_last, $"id".desc)
      val win = df
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter($"rn" <= k).select($"g", $"rn", $"id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(agg == win, s"round $round k=$k:\n agg=$agg\n win=$win")
    }
  }

  test("top_k serialization round-trips string ord/payload across a forced shuffle") {
    GraftExtensions.register(spark)
    // many partitions + repartition forces partial buffers through
    // serialize/deserialize on the exchange
    val df = spark.range(0, 1000, 1, 8)
      .select(($"id" % 7).as("g"), concat(lit("s"), lpad($"id".cast("string"), 4, "0")).as("s"))
    val out = df.groupBy($"g")
      .agg(call_function("top_k", $"s", $"s", lit(3)).as("tk"))
      .select($"g", $"tk.val".as("top"))
      .orderBy($"g").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1)))
    // per residue class g, the largest zero-padded ids descending
    val expect = (0L until 7L).map { g =>
      val ids = (0L until 1000L).filter(_ % 7 == g).map(i => f"s$i%04d").sorted.reverse.take(3)
      (g, ids)
    }
    assert(out.toSeq == expect)
  }
}
