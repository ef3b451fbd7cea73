package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) / §7 (plan).
  *
  * Each `queries` entry is an operator of the engine applied to the test
  * tables; each `oracleSql` entry is the same computation in ANSI SQL for
  * the DuckDB oracle. Column names and ordering are aligned on both sides
  * (SURVEY §4 portability rules).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.pricingSummary(Tables.lineitem(spark, "/root/testdata/sf0.001"))

  private def t(name: String)(implicit s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, name)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.B analytic core -------------------------------------------
    "q1_agg" -> ((s, d) => Analytics.pricingSummary(Tables.lineitem(s, d))),
    "q3_join" -> ((s, d) =>
      Analytics.shippingPriority(Tables.customer(s, d), Tables.orders(s, d), Tables.lineitem(s, d))),
    "q5_join" -> ((s, d) =>
      Analytics.localSupplierVolume(Tables.region(s, d), Tables.nation(s, d), Tables.customer(s, d),
        Tables.supplier(s, d), Tables.orders(s, d), Tables.lineitem(s, d))),
    "q_window_rank" -> ((s, d) => Analytics.topNPerGroup(Tables.orders(s, d), 5)),
    "q_window_running" -> ((s, d) => Analytics.runningAggregates(Tables.events(s, d))),
    "q_semi_anti" -> ((s, d) => Analytics.semiAntiCounts(Tables.customer(s, d), Tables.orders(s, d))),
    "q_rollup" -> ((s, d) => Analytics.rollupSummary(Tables.lineitem(s, d))),
    "q_distinct_agg" -> ((s, d) => Analytics.distinctCounts(Tables.lineitem(s, d))),
    "q_skew_agg" -> ((s, d) => Analytics.orderSizeDistribution(Tables.lineitem(s, d)))
  )

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(sum(l_extendedprice), 4) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 4) AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_join" ->
      """SELECT o_orderkey, o_orderdate, o_orderpriority,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,
    "q5_join" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q_window_rank" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 5
        |ORDER BY o_orderpriority, rn""".stripMargin,
    "q_window_running" ->
      """SELECT event_id, user_id, ts,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_sum,
        |  round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS moving_avg5
        |FROM (SELECT event_id, user_id, epoch_us(ts) AS ts, value FROM events) e
        |ORDER BY user_id, ts, event_id""".stripMargin,
    "q_semi_anti" ->
      """SELECT * FROM (
        |  SELECT 'with_orders' AS grp, count(*) AS cnt FROM customer
        |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |  UNION ALL
        |  SELECT 'without_orders' AS grp, count(*) AS cnt FROM customer
        |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) t
        |ORDER BY grp""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty, count(*) AS cnt
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_distinct_agg" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS nd_part,
        |  count(DISTINCT l_suppkey) AS nd_supp,
        |  count(*) AS cnt
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_skew_agg" ->
      """SELECT n_items, count(*) AS n_orders,
        |  round(avg(order_qty), 4) AS avg_order_qty
        |FROM (
        |  SELECT l_orderkey, count(*) AS n_items,
        |    round(sum(l_quantity), 4) AS order_qty
        |  FROM lineitem GROUP BY l_orderkey) t
        |GROUP BY n_items
        |ORDER BY n_items""".stripMargin
  )
}
