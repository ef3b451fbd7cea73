package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.GraftExtensions

/** Binary container ingestion — the reference's topic-extraction stage
  * (service/app/main.py:77 `process_file`: read a bag container, split
  * messages by topic, stamp provenance, write one partitioned table per
  * topic). The container format is the deterministic stand-in codec of
  * [[graft.plans.ContainerCodec]] (no public bag codec in-sandbox); the
  * Spark shape is the real thing:
  *
  *  - `spark.read.format("binaryFile")` turns a directory of container
  *    files into (path, content) rows — files parallelize across the
  *    cluster, one task per file (or split), no driver loop;
  *  - `container_unpack` + `explode` turn each container into per-message
  *    rows entirely map-side;
  *  - provenance (`bag_file` from the file name — main.py:95) is a
  *    column expression, and the partitioned per-topic write is
  *    [[TopicStore.write]] — pruning by (topic, bag_file) at read time.
  */
object Containers {

  /** array<struct<topic,ts_us,payload>> → container binary column. */
  def pack(msgs: Column): Column = call_function("container_pack", msgs)

  /** container binary column → array<struct<topic,ts_us,payload>>. */
  def unpack(blob: Column): Column = call_function("container_unpack", blob)

  /** Per-message rows (topic, ts_us, payload, bag_file) from a directory
    * of container files.
    */
  def readContainerFiles(spark: SparkSession, dir: String): DataFrame = {
    GraftExtensions.register(spark)
    spark.read.format("binaryFile").load(dir)
      .select(
        regexp_extract(col("path"), "([^/]+)\\.bin$", 1).as("bag_file"),
        explode(unpack(col("content"))).as("m"))
      .select(col("bag_file"), col("m.topic").as("topic"),
        col("m.ts_us").as("ts_us"), col("m.payload").as("payload"))
  }

  /** array<struct<topic,ts_us,payload>> → ROS bag v2.0 binary column
    * ([[graft.plans.BagCodec]] — the real `.bag` format, closing the
    * gap the container codec stands in for). `compression` ∈ {none,bz2}.
    */
  def bagPack(msgs: Column, compression: Column): Column =
    call_function("bag_pack", msgs, compression)

  /** ROS bag v2.0 binary column → array<struct<topic,ts_us,payload>>. */
  def bagUnpack(blob: Column): Column = call_function("bag_unpack", blob)

  /** Per-message rows (topic, ts_us, payload, bag_file) from a directory
    * of real `.bag` files — the reference's ingestion entry
    * (service/app/main.py:87-94) as one declarative scan: one file per
    * task via `binaryFile`, parse map-side, no shuffle. Bags over the
    * binaryFile 2 GiB single-file ceiling need chunk-boundary splitting
    * (the chunk-info index supports it) — not needed at the reference's
    * per-bag sizes, where a file is one task and files parallelize.
    */
  def readBagFiles(spark: SparkSession, dir: String): DataFrame = {
    GraftExtensions.register(spark)
    spark.read.format("binaryFile").load(dir)
      .select(
        regexp_extract(col("path"), "([^/]+)\\.bag$", 1).as("bag_file"),
        explode(bagUnpack(col("content"))).as("m"))
      .select(col("bag_file"), col("m.topic").as("topic"),
        col("m.ts_us").as("ts_us"), col("m.payload").as("payload"))
  }

  /** Full extraction stage: containers → per-topic partitioned store
    * (main.py:77-124 re-expressed; the DynamoDB topic table is the
    * `topicStats`-style manifest a caller derives from the same frame).
    */
  def extractToStore(spark: SparkSession, containerDir: String,
                     storeDir: String, topics: Seq[String]): Unit = {
    val msgs = readContainerFiles(spark, containerDir)
      .filter(col("topic").isin(topics: _*))
    TopicStore.write(msgs, storeDir)
  }
}
