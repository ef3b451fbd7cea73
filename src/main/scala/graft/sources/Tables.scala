package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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
}
