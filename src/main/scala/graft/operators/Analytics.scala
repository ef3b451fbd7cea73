package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytic core: grouped aggregation, multi-way joins, windows, rollups.
  *
  * These anchor engine correctness on the star schema and are written the
  * way they should run at 100 TB: dimension tables broadcast, fact-fact
  * joins shuffle on their keys under AQE, aggregates are partial (map-side
  * combine is automatic for hash aggregates), and every double aggregate is
  * rounded at the edge so results are engine-portable.
  */
object Analytics {

  /** round(col, 4) — shared precision for cross-engine double compares. */
  private def r4(c: Column): Column = round(c, 4)

  /** TPC-H Q1-shaped pricing summary over `lineitem`.
    * Single shuffle on the (returnflag, linestatus) grouping key; partial
    * aggregation happens map-side before the exchange.
    */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        r4(sum(col("l_quantity"))).as("sum_qty"),
        r4(sum(col("l_extendedprice"))).as("sum_base_price"),
        r4(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("sum_disc_price"),
        r4(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))).as("sum_charge"),
        r4(avg(col("l_quantity"))).as("avg_qty"),
        r4(avg(col("l_extendedprice"))).as("avg_price"),
        r4(avg(col("l_discount"))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q3-shaped shipping-priority query.
    * No broadcast hint on `customer`: it scales with SF, so the choice
    * belongs to AQE's size-based planning (a hint would override it and
    * OOM at the 100 TB target); the orders⋈lineitem join shuffles on the
    * order key.
    */
  def shippingPriority(customer: DataFrame, orders: DataFrame, lineitem: DataFrame): DataFrame =
    customer.filter(col("c_mktsegment") === "BUILDING")
      .join(orders, col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .join(lineitem.filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(r4(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)

  /** TPC-H Q5-shaped snowflake join: region→nation are FIXED-cardinality
    * dimensions (25/5 rows at every SF) — hinting them broadcast is
    * always right. customer/supplier grow with SF, so their join strategy
    * is left to AQE's size-based choice: hash-shuffle at 100 TB,
    * broadcast at small SF — a hardcoded hint would be an OOM at scale.
    */
  def localSupplierVolume(region: DataFrame, nation: DataFrame, customer: DataFrame,
                          supplier: DataFrame, orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val asiaNations = broadcast(
      nation.join(broadcast(region.filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey")))
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(supplier,
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(asiaNations, col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(r4(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** EXACT linear-interpolation percentiles per group via a windowed
    * rank — one shuffle + one local sort, then arithmetic:
    * target rank r = 1 + (n−1)·p; the values at ⌊r⌋ and ⌈r⌉ interpolate.
    *
    * Spark's builtin `percentile` aggregate buffers a value→count map
    * PER GROUP in the aggregation hash table — a skewed group at 100 TB
    * is an executor OOM. The windowed form sorts within the shuffle
    * (spillable) and keeps O(1) per-row state; measured ~4× faster at
    * sf0.1 too (the map maintenance dominates the builtin).
    */
  def exactPercentiles(df: DataFrame, groupCol: String, valueCol: String,
                       ps: Seq[(String, Double)]): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
    def r(p: Double): Column = lit(1.0) + (col("__n") - 1) * lit(p)
    // NULL values are ignored, like the builtin percentile aggregate —
    // they must not occupy ranks or count toward n
    val ranked = df.select(col(groupCol), col(valueCol))
      .filter(col(valueCol).isNotNull)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(groupCol))))
    // only rows that participate in some interpolation survive the window
    val needed = ps.map { case (_, p) =>
      col("__rn") === floor(r(p)) || col("__rn") === ceil(r(p))
    }.reduce(_ || _)
    val aggExprs = max(col("__n")).as("__n") +: ps.flatMap { case (name, p) =>
      Seq(
        max(when(col("__rn") === floor(r(p)), col(valueCol))).as(s"__lo_$name"),
        max(when(col("__rn") === ceil(r(p)), col(valueCol))).as(s"__hi_$name"))
    }
    val agged = ranked.filter(needed)
      .groupBy(col(groupCol)).agg(aggExprs.head, aggExprs.tail: _*)
    // groups whose values are ALL null have no ranked rows but must still
    // emit a row with null percentiles, like the builtin aggregate; the
    // join-back is null-safe (<=>) so a NULL group key still receives the
    // percentiles its non-null values produced (a plain equi-join would
    // silently null them out)
    val allGroups = df.select(col(groupCol)).distinct()
    allGroups.join(agged.withColumnRenamed(groupCol, "__gk"),
        col(groupCol) <=> col("__gk"), "left")
      .select(col(groupCol) +: ps.map { case (name, p) =>
        (col(s"__lo_$name") +
          (r(p) - floor(r(p))) * (col(s"__hi_$name") - col(s"__lo_$name"))).as(name)
      }: _*)
  }

  /** Top-N rows per group via `row_number` — one shuffle on the partition
    * key; the per-group sort is local to each partition.
    */
  def topNPerGroup(orders: DataFrame, n: Int): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= n)
      .orderBy(col("o_orderpriority"), col("rn"))
  }

  /** Top-n per group via the native bounded-heap aggregate
    * ([[graft.plans.TopK]]) — same contract as [[topNPerGroup]] but as a
    * hash aggregate: the map side reduces each partition to ≤ groups·n
    * entries BEFORE the exchange, so shuffle volume is groups·n rows
    * independent of input size (the window form shuffles and sorts the
    * whole table). Ties on price break to the larger orderkey (struct
    * ordering is lexicographic; emission is descending).
    */
  def topNPerGroupAgg(orders: DataFrame, n: Int): DataFrame = {
    graft.plans.GraftExtensions.register(orders.sparkSession)
    orders
      .groupBy(col("o_orderpriority"))
      .agg(call_function("top_k",
        struct(col("o_totalprice"), col("o_orderkey")), col("o_orderkey"), lit(n)).as("tk"))
      .select(col("o_orderpriority"), posexplode(col("tk")))
      .select(col("o_orderpriority"),
        (col("pos") + 1).cast("long").as("rn"),
        col("col.val").as("o_orderkey"),
        col("col.ord.o_totalprice").as("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("rn"))
  }

  /** Running sum + moving average per user over event time. Partitioned by
    * user → parallel across users, single sort per user partition.
    */
  def runningAggregates(events: DataFrame): DataFrame = {
    // event time compared cross-engine at microsecond precision,
    // dtype-adaptive (epoch-nano bigint or parquet timestamp)
    val withUs = events.withColumn("ts_us", graft.sources.Tables.epochUs(events))
    val order = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val last5 = order.rowsBetween(-4, Window.currentRow)
    withUs.select(
        col("event_id"), col("user_id"), col("ts_us").as("ts"),
        r4(sum(col("value")).over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow))).as("running_sum"),
        r4(avg(col("value")).over(last5)).as("moving_avg5"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** TRAILING EVENT-TIME window aggregates — the RANGE-frame member of
    * the window family ([[runningAggregates]] is the ROWS-frame one):
    * per event, the sum of values and the distinct event-type count over
    * the last `windowUs` of the SAME user's events, frame bounds in
    * event-time units so sparse and dense streams get the same horizon
    * (a rows frame would mean "last k events" — a different quantity).
    *
    * Spark has no DISTINCT window aggregates; `size(collect_set(..))`
    * is the standard formulation and stays inside the same single
    * user-key exchange + sort every frame here shares. RANGE frames
    * include all peer rows of the current timestamp on both engines, so
    * intra-timestamp order cannot affect results (no tiebreak needed in
    * the ORDER BY — only in the terminal presentation sort).
    */
  def trailingRangeAggregates(events: DataFrame, windowUs: Long): DataFrame = {
    require(windowUs >= 0, s"windowUs must be non-negative: $windowUs")
    val withUs = events.withColumn("ts_us", graft.sources.Tables.epochUs(events))
    val trailing = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-windowUs, Window.currentRow)
    withUs.select(
        col("event_id"), col("user_id"), col("ts_us").as("ts"),
        r4(sum(col("value")).over(trailing)).as("trailing_sum"),
        size(collect_set(col("event_type")).over(trailing)).cast("long").as("n_types"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** Existence queries as left-semi / left-anti joins (never a distinct +
    * inner join — semi/anti stop at first match and never duplicate).
    */
  def semiAntiCounts(customer: DataFrame, orders: DataFrame): DataFrame = {
    val withOrders = customer.join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("cnt")).select(lit("with_orders").as("grp"), col("cnt"))
    val withoutOrders = customer.join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("cnt")).select(lit("without_orders").as("grp"), col("cnt"))
    withOrders.unionByName(withoutOrders).orderBy(col("grp"))
  }

  /** Multi-level aggregation via ROLLUP — one shuffle; Spark expands
    * grouping sets without rescanning the input.
    */
  def rollupSummary(lineitem: DataFrame): DataFrame =
    lineitem.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(r4(sum(col("l_quantity"))).as("sum_qty"), count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Exact distinct counts per group. (Approximate HLL variants are
    * engine-specific and covered by spec tests, not the SQL oracle.)
    */
  def distinctCounts(lineitem: DataFrame): DataFrame =
    lineitem.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("nd_part"),
        countDistinct(col("l_suppkey")).as("nd_supp"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"))

  /** Two-level aggregation over a high-cardinality key (order-level then
    * global distribution). At scale the first level is where skew lives;
    * AQE skew-split handles it because the plan is a plain hash aggregate.
    */
  def orderSizeDistribution(lineitem: DataFrame): DataFrame =
    lineitem.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_items"), r4(sum(col("l_quantity"))).as("order_qty"))
      .groupBy(col("n_items"))
      .agg(count(lit(1)).as("n_orders"), r4(avg(col("order_qty"))).as("avg_order_qty"))
      .orderBy(col("n_items"))

  /** MERGEABLE distinct-count SKETCH TABLE — the incremental-rollup
    * pattern behind "distinct users per day, re-aggregable to any date
    * range without rescanning": one HLL sketch row per bucket (Spark's
    * builtin DataSketches `hll_sketch_agg`), persisted like any column.
    * Re-aggregation over buckets is [[sketchEstimate]]'s `hll_union_agg`
    * — register-wise max, so the merged estimate is IDENTICAL to a
    * sketch built over the union of the raw data (spec-pinned), while
    * the rollup reads sketch rows instead of the 100 TB of raw events.
    * Engine-specific binary output ⇒ spec-tested, not oracle-keyed
    * (same policy as [[distinctCounts]]'s note).
    */
  def sketchRollup(events: DataFrame, bucketCol: Column, keyCol: Column,
                   lgK: Int = 12): DataFrame =
    events.groupBy(bucketCol.as("bucket"))
      .agg(hll_sketch_agg(keyCol, lit(lgK)).as("sketch"),
        count(lit(1)).as("n_rows"))

  /** Estimated distinct keys across a set of sketch rows (one union). */
  def sketchEstimate(sketches: DataFrame): DataFrame =
    sketches.agg(
      hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false))).as("nd_estimate"),
      sum(col("n_rows")).as("n_rows"))

  /** EXACT re-aggregable quantiles via VALUE HISTOGRAMS — the exact
    * complement of [[quantileRollup]]'s bounded-error sketches, for
    * value domains that round to a bounded set (prices to cents, scores
    * to k decimals): one (bucket, value, count) row per bucket+value,
    * re-aggregable to any bucket range by summing counts, quantiles
    * exact at the rounding resolution.
    *
    * Shape at 100 TB: the rollup is one map-side-combined aggregate;
    * the exchange carries buckets × distinct-values rows — bounded by
    * the DOMAIN, not the data.
    */
  def histogramRollup(df: DataFrame, bucketCol: Column, valueCol: Column,
                      scale: Int = 2): DataFrame =
    df.groupBy(bucketCol.as("bucket"), round(valueCol, scale).as("v"))
      .agg(count(lit(1)).as("n"))

  /** Type-1 (inclusive, no interpolation) quantiles from histogram rows:
    * smallest v whose cumulative count reaches ceil(q·N). The window
    * runs over the MERGED histogram — cardinality = distinct rounded
    * values, so the single partition is domain-bounded, not data-bounded
    * (the one case a partition-less window is correct at scale).
    */
  def histogramQuantiles(hist: DataFrame, quantiles: Seq[Double]): DataFrame = {
    val merged = hist.groupBy(col("v")).agg(sum(col("n")).as("n"))
    val w = Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, 0)
    val cum = merged.withColumn("cum", sum(col("n")).over(w))
    val total = merged.agg(sum(col("n")).as("total"))
    val cols = quantiles.map { q =>
      min(when(col("cum") >= ceil(lit(q) * col("total")), col("v")))
        .as(s"p${(q * 100).round}")
    } :+ max(col("total")).cast("long").as("n_rows")
    cum.crossJoin(broadcast(total)).agg(cols.head, cols.tail: _*)
  }

  /** MERGEABLE QUANTILE sketch table — the quantile twin of
    * [[sketchRollup]] ("p99 latency per day, re-aggregable to any date
    * range without rescanning"): one KLL sketch row per bucket
    * ([[graft.plans.KllSketchAgg]] — Spark ships the DataSketches jar
    * for hll_* but exposes no quantile-sketch aggregate). KLL guarantees
    * ~1.65% normalized rank error at the default k=200 REGARDLESS of
    * input size, and sketches union losslessly w.r.t. that bound — the
    * rollup reads k-sized sketch rows instead of the raw 100 TB.
    * Engine-specific binary ⇒ spec-tested, not oracle-keyed (same
    * policy as [[sketchRollup]]).
    */
  def quantileRollup(events: DataFrame, bucketCol: Column, valueCol: Column,
                     k: Int = 200): DataFrame = {
    graft.plans.GraftExtensions.register(events.sparkSession)
    events.groupBy(bucketCol.as("bucket"))
      .agg(call_function("kll_sketch_agg", valueCol, lit(k)).as("qsketch"),
        count(lit(1)).as("n_rows"))
  }

  /** HEAVY-HITTERS rollup — the frequency member of the sketch trio
    * (HLL distinct counts, KLL quantiles, frequent items): one
    * Misra-Gries/SpaceSaving sketch per bucket, re-aggregable to any
    * bucket combination. The exchange carries buckets × maxMapSize
    * entries — bounded by the sketch capacity, not the data. While a
    * bucket's distinct items stay under the capacity's load factor the
    * counts are EXACT (the oracle-able regime); beyond it, estimates
    * over-count by at most the published n/maxMapSize bound.
    */
  def freqRollup(df: DataFrame, bucketCol: Column, itemCol: Column,
                 maxMapSize: Int = 1024): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    df.groupBy(bucketCol.as("bucket"))
      .agg(call_function("freq_sketch_agg", itemCol, lit(maxMapSize)).as("fsketch"),
        count(lit(1)).as("n_rows"))
  }

  /** Top-k heavy hitters across a set of sketch rows (one union),
    * exploded to (item, estimate, lower_bound, upper_bound) rows ordered
    * (estimate DESC, item ASC).
    */
  def freqTopK(sketches: DataFrame, k: Int): DataFrame = {
    graft.plans.GraftExtensions.register(sketches.sparkSession)
    sketches.agg(call_function("freq_merge_agg", col("fsketch")).as("__m"))
      .select(explode(call_function("freq_topk", col("__m"), lit(k))).as("hh"))
      .select(col("hh.item").as("item"), col("hh.estimate").as("estimate"),
        col("hh.lower_bound").as("lower_bound"), col("hh.upper_bound").as("upper_bound"))
  }

  /** Quantile estimates across a set of sketch rows (one union): one row
    * with a `p<rank>` column per requested quantile + the exact row
    * count.
    */
  def quantileEstimate(sketches: DataFrame, quantiles: Seq[Double]): DataFrame = {
    graft.plans.GraftExtensions.register(sketches.sparkSession)
    val merged = sketches.agg(
      call_function("kll_merge_agg", col("qsketch")).as("__m"),
      sum(col("n_rows")).as("n_rows"))
    val cols = quantiles.map { q =>
      call_function("kll_quantile", col("__m"), lit(q))
        .as(s"p${(q * 100).round}")
    } :+ col("n_rows")
    merged.select(cols: _*)
  }
}
