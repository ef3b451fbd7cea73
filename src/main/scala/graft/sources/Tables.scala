package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Loaders for the lakehouse tables the engine operates on.
  *
  * Mirrors the reference's per-table parquet layout
  * (service/app/main.py:118 writes one parquet tree per topic; the
  * spark_scripts read them back with `spark.read.load`): each logical
  * table is a parquet dataset under a base directory. Column pruning and
  * predicate pushdown reach the scan because loads stay declarative —
  * callers `.select`/`.filter` on the returned frame and Catalyst pushes
  * into the parquet reader.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Epoch-microsecond view of an event-time column, adaptive to the
    * physical parquet type. Generated data has shipped `ts` both as
    * parquet TIMESTAMP(NANOS) — which
    * `spark.sql.legacy.parquet.nanosAsLong` surfaces as an epoch-nano
    * bigint — and as TIMESTAMP(MICROS, NTZ), which Spark reads as
    * `timestamp_ntz`. A bigint is integer-divided to µs (double division
    * would lose precision past 2^53); any timestamp flavor is cast to
    * `timestamp` (≡ UTC wall time under the engine's UTC session zone)
    * and converted with `unix_micros`. Both arms equal DuckDB's
    * `epoch_us(ts)` on the corresponding physical type, keeping the
    * oracle comparison stable across testdata regenerations.
    */
  def epochUs(df: DataFrame, c: String = "ts"): Column =
    df.schema(c).dataType match {
      case LongType => expr(s"`$c` DIV 1000")
      case _        => unix_micros(col(c).cast(TimestampType))
    }

  /** events with event time projected to an epoch-µs `ts_us` column. */
  def eventsUs(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    e.withColumn("ts_us", epochUs(e))
  }
}
