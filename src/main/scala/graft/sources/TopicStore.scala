package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The signal lake's storage layout: one parquet dataset partitioned by
  * (topic, group) — the reference's `<topic>/bag_file=<bag>/data.parq`
  * tree (service/app/main.py:117-125) and its partitioned batch writes
  * (spark_scripts/synchronize_topics.py:88 `write_results`,
  * detect_scenes.py:162).
  *
  * Partition columns are the pruning keys: reading one topic of one bag
  * touches exactly that directory; at 100 TB the topic/bag predicate never
  * scans a foreign partition. Writes are append-mode per batch, matching
  * the reference's idempotent batch append.
  */
object TopicStore {

  /** Write signals partitioned by topic then group. */
  def write(df: DataFrame, baseDir: String, topicCol: String = "topic",
            groupCol: String = "bag_file", mode: String = "append"): Unit =
    df.write.mode(mode).partitionBy(topicCol, groupCol).parquet(baseDir)

  /** Read the whole store (partition columns reappear as columns). */
  def read(spark: SparkSession, baseDir: String): DataFrame =
    spark.read.parquet(baseDir)

  /** Read one topic — prunes to the topic's directory subtree. */
  def readTopic(spark: SparkSession, baseDir: String, topic: String,
                topicCol: String = "topic"): DataFrame =
    read(spark, baseDir).filter(col(topicCol) === topic)

  /** Read one topic of one group (single leaf directory). */
  def readTopicGroup(spark: SparkSession, baseDir: String, topic: String,
                     group: String, topicCol: String = "topic",
                     groupCol: String = "bag_file"): DataFrame =
    read(spark, baseDir).filter(col(topicCol) === topic && col(groupCol) === group)

  /** Write a table bucketed on join keys: co-partitions and co-sorts the
    * data on disk so future joins/aggregations on those keys need NO
    * shuffle — the storage-side answer to repeated fact-fact joins at
    * 100 TB (pay the shuffle once at write time).
    */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Bucket on join keys AND sort inside each bucket by (keys ++
    * sortCols) — the sort-merge-bucket (SMB) layout for the ORDERED
    * join family: AsOfJoinExec/RangeJoinExec require clustering on the
    * key plus (key, time) order, and a bucket-sorted read satisfies
    * BOTH, so the time joins plan with ZERO exchange and ZERO sort —
    * the whole join cost at 100 TB is the two scans.
    *
    * The input is repartitioned to exactly `buckets` partitions on the
    * keys (same hash family as the bucket spec), so each task writes
    * one file per bucket — the one-file-per-bucket invariant Spark's
    * scan needs to report the sort order (multiple files per bucket
    * cannot be read as one sorted stream and silently drop the
    * ordering). Readers must opt in with
    * `spark.sql.legacy.bucketedTableScan.outputOrdering=true` (Spark
    * 3.0+ stopped reporting bucket sort order by default; this writer
    * guarantees the invariant that conf assumes). Spec-pinned:
    * TopicStoreSpec's SMB test asserts the zero-exchange-zero-sort
    * as-of plan.
    */
  def writeBucketedSorted(df: DataFrame, table: String, keys: Seq[String],
                          sortCols: Seq[String], buckets: Int): Unit = {
    val all = keys ++ sortCols
    df.repartition(buckets, keys.map(col): _*)
      .write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(all.head, all.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Append a micro-batch into an existing bucket-sorted table (same
    * spec as [[writeBucketedSorted]] — Spark validates the bucket/sort
    * spec against the table's). Each append adds one file set per
    * bucket, so the one-file-per-bucket invariant the ZERO-SORT read
    * depends on degrades (the join stays correct, it just pays its sort
    * again) — [[compactBucketedSorted]] restores it; the streaming twin
    * [[graft.streaming.Streaming.smbSink]] triggers that automatically.
    */
  def appendBucketedSorted(df: DataFrame, table: String, keys: Seq[String],
                           sortCols: Seq[String], buckets: Int): Unit = {
    val all = keys ++ sortCols
    df.repartition(buckets, keys.map(col): _*)
      .write.mode("append")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(all.head, all.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  private def tablePath(spark: org.apache.spark.sql.SparkSession,
                        table: String): org.apache.hadoop.fs.Path = {
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    new org.apache.hadoop.fs.Path(
      if (spark.catalog.tableExists(table))
        spark.sessionState.catalog.getTableMetadata(ident).location
      else spark.sessionState.catalog.defaultTablePath(ident))
  }

  /** Largest per-bucket data-file count — 1 means the zero-sort SMB
    * invariant holds; anything larger means the scan stops reporting
    * sort order and ordered joins pay a sort until compaction. Bucket
    * ids are parsed from the writer's `..._NNNNN.c000` file-name suffix.
    * Hadoop FS throughout (HDFS/S3-portable).
    */
  def maxFilesPerBucket(spark: org.apache.spark.sql.SparkSession,
                        table: String): Int = {
    val loc = tablePath(spark, table)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(loc)) 0
    else {
      val bucketId = "_(\\d{5})\\.".r
      val ids = fs.listStatus(loc).toSeq
        .map(_.getPath.getName)
        .filterNot(n => n.startsWith("_") || n.startsWith("."))
        .flatMap(n => bucketId.findFirstMatchIn(n).map(_.group(1)))
      if (ids.isEmpty) 0 else ids.groupBy(identity).values.map(_.size).max
    }
  }

  /** Drop a table AND its warehouse directory. A plain DROP in a fresh
    * session whose in-memory catalog never saw the table leaves the old
    * location on disk, and the next saveAsTable fails on it — this
    * covers both halves through the Hadoop FS API.
    */
  def dropTableAndLocation(spark: org.apache.spark.sql.SparkSession,
                           table: String): Unit = {
    val loc = tablePath(spark, table)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** Rewrite a bucket-sorted table back to one file per bucket,
    * restoring the zero-exchange zero-sort read after fragmented
    * appends. The compacted copy lands in `<table>__compact` first
    * (data is never at risk), then a DROP + RENAME swap — if the swap
    * is interrupted between the two statements, [[recoverBucketedSorted]]
    * finishes it. Single-writer only.
    */
  def compactBucketedSorted(spark: org.apache.spark.sql.SparkSession,
                            table: String, keys: Seq[String],
                            sortCols: Seq[String], buckets: Int): Unit = {
    val tmp = table + "__compact"
    dropTableAndLocation(spark, tmp)
    // read the RAW files, not the catalog table: a bucketed scan
    // advertises HashPartitioning(keys, buckets), so the writer's
    // repartition is optimized away while rows actually sit in per-FILE
    // partitions — every source file then writes its own bucket file and
    // the "compacted" copy is exactly as fragmented as the original
    val src = spark.read.schema(spark.table(table).schema)
      .parquet(tablePath(spark, table).toString)
    writeBucketedSorted(src, tmp, keys, sortCols, buckets)
    spark.sql(s"DROP TABLE $table")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
  }

  /** Finish an interrupted [[compactBucketedSorted]] swap: the compacted
    * copy exists but the original was already dropped → rename completes
    * the compaction. No-op otherwise.
    */
  def recoverBucketedSorted(spark: org.apache.spark.sql.SparkSession,
                            table: String): Unit = {
    val tmp = table + "__compact"
    if (!spark.catalog.tableExists(table) && spark.catalog.tableExists(tmp))
      spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
  }

  /** Parse a semi-structured JSON payload column into typed columns with
    * an explicit schema (the reference's YAML "clean column" parse —
    * service/app/main.py:100-113 — done declaratively; no inference scan).
    */
  def parseJsonPayload(df: DataFrame, jsonCol: String, schema: StructType,
                       outCol: String = "parsed"): DataFrame =
    df.withColumn(outCol, from_json(col(jsonCol), schema))

  /** Delta-style upsert (MERGE latest-wins): union the current snapshot
    * with an updates batch and keep, per key, the row with the greatest
    * (version, tiebreak) — the declarative core of a metadata-store merge
    * (the reference's DynamoDB put_item overwrite semantics,
    * service/app/main.py:61, re-expressed as a snapshot transform).
    *
    * One shuffle, keyed on the merge keys; at 100 TB pair it with
    * partitioned storage so only touched partitions rewrite. `orderCols`
    * must be a deterministic total order within every key (include a
    * unique id as final tiebreak).
    */
  def upsert(current: DataFrame, updates: DataFrame, keys: Seq[String],
             orderCols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(c => col(c).desc): _*)
    current.unionByName(updates, allowMissingColumns = true)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
