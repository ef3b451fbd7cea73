package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED file-statistics manifest — the scale completion of
  * [[ZOrderStore.fileStats]]/[[ZOrderStore.prunedFiles]]: re-reading
  * every footer per query is fine for a directory of dozens of files
  * and wrong for a 100 TB table of hundreds of thousands (each probe is
  * a driver-side remote read). Delta/Iceberg solve this with a manifest;
  * this is that manifest for plain-parquet layouts:
  *
  *  - [[write]] harvests per-row-group [min,max] stats from footers
  *    DISTRIBUTEDLY (one task per file batch — the driver never touches
  *    a footer) and writes them as one small parquet table under
  *    `<path>/_graft_manifest` (underscore-prefixed ⇒ invisible to
  *    Spark's own file index, like `_SUCCESS`).
  *  - [[prunedFiles]] answers a box query from the manifest when it is
  *    FRESH — the recorded (file, length, modification time) set matches
  *    the live listing exactly — and falls back to live footer reads
  *    ([[ZOrderStore.prunedFiles]]) when anything drifted, so staleness
  *    can cost a re-read, never a wrong prune.
  *
  * Row-group granularity is stored so the same manifest can later serve
  * [[ZOrderStore.pruneReport]]-style accounting; pruning here merges to
  * file granularity exactly like `fileStats` (a missing row-group stat
  * poisons the file's range → kept).
  */
object StatsManifest {

  /** Hadoop Configuration is not Serializable; the standard wrapper
    * (write/readFields through Java serialization) — same pattern as
    * Spark's own private SerializableConfiguration.
    */
  private class SerConf(@transient var value: org.apache.hadoop.conf.Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new org.apache.hadoop.conf.Configuration(false)
      value.readFields(in)
    }
  }

  private def manifestDir(path: String) = s"$path/_graft_manifest"

  private def listing(spark: SparkSession, path: String): Seq[(String, Long, Long)] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => (s.getPath.toString, s.getLen, s.getModificationTime))
  }

  /** Harvest stats for `columns` from every data file's footer (executor
    * side) and persist the manifest. Re-run after ingest/compaction.
    */
  def write(spark: SparkSession, path: String, columns: Seq[String]): Unit = {
    require(columns.nonEmpty, "manifest needs at least one column")
    import spark.implicits._
    val conf = new SerConf(spark.sessionState.newHadoopConf())
    val files = listing(spark, path)
    val cols = columns
    val rows = spark.createDataset(files)
      .repartition(math.max(1, math.min(files.size, 64)))
      .flatMap { case (f, len, mtime) =>
        import scala.jdk.CollectionConverters._
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new Path(f), conf.value)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          reader.getFooter.getBlocks.asScala.toSeq.zipWithIndex.flatMap { case (block, i) =>
            cols.map { column =>
              val stat = block.getColumns.asScala
                .find(_.getPath.toDotString == column)
                .map(_.getStatistics)
                .filter(s => s != null && !s.isEmpty && s.hasNonNullValue)
                .collect { case s if s.genericGetMin.isInstanceOf[java.lang.Long] =>
                  (s.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
                    s.genericGetMax.asInstanceOf[java.lang.Long].longValue())
                }
              (f, len, mtime, column, i, block.getRowCount,
                stat.isDefined, stat.map(_._1).getOrElse(0L), stat.map(_._2).getOrElse(0L))
            }
          }
        } finally reader.close()
      }
      .toDF("file", "len", "mtime", "column", "rg", "rows", "has_stats", "mn", "mx")
    rows.coalesce(1).write.mode("overwrite").parquet(manifestDir(path))
  }

  /** The manifest as a DataFrame, or None if never written. */
  def read(spark: SparkSession, path: String): Option[DataFrame] = {
    val p = new Path(manifestDir(path))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) Some(spark.read.parquet(manifestDir(path))) else None
  }

  /** True when the manifest's recorded (file, length, mtime) set equals
    * the live listing — any added, removed, or rewritten file flips this.
    */
  def isFresh(spark: SparkSession, path: String): Boolean =
    read(spark, path).exists { m =>
      val recorded = m.select("file", "len", "mtime").distinct().collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      recorded == listing(spark, path).toSet
    }

  /** [[ZOrderStore.prunedFiles]] from the persisted manifest when fresh
    * (no footer reads at all), live footers otherwise. The manifest must
    * cover every box column — an uncovered column also falls back.
    */
  def prunedFiles(spark: SparkSession, path: String,
                  box: Map[String, (Long, Long)]): (Seq[String], Int) = {
    val viaManifest = read(spark, path)
      .filter(_ => isFresh(spark, path))
      .flatMap { m =>
        val have = m.select("column").distinct().collect().map(_.getString(0)).toSet
        if (!box.keySet.subsetOf(have)) None
        else {
          // per (file, column): merged range, poisoned by any stat-less
          // row group — exactly fileStats' merge rule
          val boxDf = box.toSeq.map { case (c, (lo, hi)) => (c, lo, hi) }
            .toDF_(spark, "column", "lo", "hi")
          val perFileCol = m.filter(col("column").isin(box.keys.toSeq: _*))
            .groupBy(col("file"), col("column"))
            .agg(max(when(col("has_stats"), 0).otherwise(1)).as("missing"),
              min(col("mn")).as("mn"), max(col("mx")).as("mx"))
            .join(broadcast(boxDf), Seq("column"))
            .withColumn("hit",
              when(col("missing") === 1, 1) // no stats: must keep
                .when(col("mx") >= col("lo") && col("mn") <= col("hi"), 1)
                .otherwise(0))
          val kept = perFileCol.groupBy(col("file"))
            .agg(min(col("hit")).as("all_hit"), count(lit(1)).as("n_cols"))
            .filter(col("all_hit") === 1 && col("n_cols") === box.size)
            .select("file").collect().map(_.getString(0)).toSeq.sorted
          val total = m.select("file").distinct().count().toInt
          Some((kept, total))
        }
      }
    viaManifest.getOrElse(ZOrderStore.prunedFiles(spark, path, box))
  }

  // Seq[(String, Long, Long)].toDF needs the session's implicits; tiny
  // explicit helper keeps the call site clean inside this object
  private implicit class ToDfOps(private val rows: Seq[(String, Long, Long)]) {
    def toDF_(spark: SparkSession, c1: String, c2: String, c3: String): DataFrame = {
      import spark.implicits._
      rows.toDF(c1, c2, c3)
    }
  }
}
