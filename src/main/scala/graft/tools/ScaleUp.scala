package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Build an N× scale step of a driver-generated sf directory by
  * deterministic, referentially-consistent replication — the input for
  * the scale-step bench (`SPARK_GRAFT_SF_DIR=<out> runMain graft.Bench`)
  * that checks the engine's plans an order of magnitude up, since no
  * sf1 corpus ships on disk.
  *
  * {{{ runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/graft_sf1 10 }}}
  *
  * Replication rules (replica r ∈ [0, N)):
  *  - every join key shifts by r·10^8 (custkey, orderkey, partkey,
  *    suppkey, user_id, event_id, doc_id, vec_id), so all FK
  *    relationships hold within a replica and never leak across — join
  *    fan-outs scale exactly linearly, aggregates get N× groups;
  *  - nation/region (bounded dims in TPC-H too) are copied as-is, so
  *    broadcast-ability at scale is preserved honestly;
  *  - events keep their timestamps but replicas jitter +r ms, avoiding
  *    N-way exact-tie pileups in as-of/windows while preserving the
  *    time distribution;
  *  - document text gets the same per-replica token bijection as the
  *    bench scaling section (w → w+"x"+r): shingle structure per unit
  *    of data is preserved, cross-replica shingles are disjoint (no
  *    synthetic near-dup pairs);
  *  - embeddings perturb each component by a tiny doc-and-dim keyed
  *    delta in replicas > 0: vectors stay in-distribution but are not
  *    exact cross-replica duplicates (which would quadratically inflate
  *    the near-dup pair space — a workload change, not a scale-up).
  */
object ScaleUp {
  private val Shift = 100000000L

  def main(args: Array[String]): Unit = {
    val in = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_sf1")
    val n = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .withExtensions(new graft.plans.GraftExtensions),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    write(spark, in, out, n)
    spark.stop()
  }

  def write(spark: SparkSession, in: String, out: String, n: Int): Unit = {
    def rep(df: DataFrame): DataFrame =
      df.select(col("*"), explode(expr(s"sequence(0, ${n - 1})")).as("rep"))
    def shifted(c: String) = (col(c) + col("rep") * Shift).as(c)

    def save(name: String, df: DataFrame, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$out/$name.parquet")

    val P = math.min(32, n * 4)

    // bounded dims: copy as-is (stay broadcastable — that's the honest
    // shape; TPC-H nation/region are fixed-size at every SF)
    Seq("nation", "region").foreach { t =>
      save(t, spark.read.parquet(s"$in/$t.parquet"), 1)
    }

    save("customer", rep(spark.read.parquet(s"$in/customer.parquet"))
      .select(shifted("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment")), P)

    save("supplier", rep(spark.read.parquet(s"$in/supplier.parquet"))
      .select(shifted("s_suppkey"), col("s_name"), col("s_nationkey"),
        col("s_acctbal")), P)

    save("part", rep(spark.read.parquet(s"$in/part.parquet"))
      .select(shifted("p_partkey"), col("p_name"), col("p_brand"),
        col("p_type"), col("p_size"), col("p_retailprice")), P)

    save("orders", rep(spark.read.parquet(s"$in/orders.parquet"))
      .select(shifted("o_orderkey"), shifted("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority")), P)

    save("lineitem", rep(spark.read.parquet(s"$in/lineitem.parquet"))
      .select(shifted("l_orderkey"), shifted("l_partkey"),
        shifted("l_suppkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"),
        col("l_returnflag"), col("l_linestatus"), col("l_shipdate")), P)

    // +1 ms per replica, dtype-adaptive: events.ts has shipped as BOTH
    // parquet TIMESTAMP (interval add) and epoch-nano bigint (plain
    // arithmetic) across driver regenerations — handle either
    val ev = spark.read.parquet(s"$in/events.parquet")
    val jittered =
      if (ev.schema("ts").dataType.isInstanceOf[org.apache.spark.sql.types.LongType.type])
        (col("ts") + col("rep") * 1000000L).as("ts") // nanos
      else (col("ts") + expr("make_interval(0,0,0,0,0,0,rep*0.001)")).as("ts")
    save("events", rep(ev)
      .select(shifted("event_id"), jittered,
        shifted("user_id"), col("event_type"), col("value"), col("props")), P)

    save("documents", rep(spark.read.parquet(s"$in/documents.parquet"))
      .select(shifted("doc_id"),
        when(col("rep") === 0, col("text")).otherwise(expr(
          "array_join(transform(split(text, ' '), w -> concat(w, 'x', rep)), ' ')"))
          .as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text"))), P)

    // the perturbation must stay FLOAT end to end: a double literal in
    // the lambda silently widens the array to array<double> and every
    // vec_* expression downstream rejects it
    save("embeddings", rep(spark.read.parquet(s"$in/embeddings.parquet"))
      .select(shifted("vec_id"),
        expr("transform(embedding, (x, i) -> CAST(" +
          "x + rep * (pmod(vec_id * 31 + i, 7) - 3) * 1e-3 AS FLOAT))")
          .as("embedding"),
        col("label")), P)
  }
}
