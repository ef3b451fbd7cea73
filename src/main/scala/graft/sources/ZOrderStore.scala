package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ZOrder

/** Z-order clustered parquet layout + file-level min/max pruning — the
  * lakehouse "data skipping" pair:
  *
  *  - [[write]] sorts the table by the Morton code of two columns
  *    (range-partitioned so files tile the z-curve) — rows near each
  *    other in EITHER dimension land in few files, so every file's
  *    per-column min/max footprint is a small box.
  *  - [[prunedFiles]] reads only the parquet FOOTERS (a few KB per file)
  *    and keeps the files whose [min,max] intersects the query box —
  *    at 100 TB this is the difference between reading every file and
  *    touching only the z-tiles the box overlaps. Vanilla Spark's
  *    parquet source prunes ROW GROUPS once a file is opened but has no
  *    file-level stats index; this helper is that index, computed from
  *    the files themselves (what Delta/Iceberg keep in their manifests).
  *
  * Everything goes through the Hadoop FileSystem API (works on
  * HDFS/S3/file: alike); footers are read with parquet-hadoop, which
  * ships with Spark. One footer read serves all box columns.
  */
object ZOrderStore {

  /** Write `df` z-ordered by (colA, colB) into `numFiles` files. */
  def write(df: DataFrame, colA: String, colB: String, path: String,
            numFiles: Int): Unit = {
    df.withColumn("__z", ZOrder.zorder64(col(colA), col(colB)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file [min,max] of long columns, straight from parquet footers:
    * (file, column -> merged range). A column maps to None when any row
    * group lacks usable stats — callers must keep such files, never
    * skip blind.
    */
  def fileStats(spark: SparkSession, path: String, columns: Seq[String])
      : Seq[(String, Map[String, Option[(Long, Long)]])] = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(path).getFileSystem(conf)
    val files = fs.listStatus(new Path(path)).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath)
    files.map { p =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val blocks = reader.getFooter.getBlocks.asScala.toSeq
        val perCol = columns.map { column =>
          val ranges = blocks.map { block =>
            block.getColumns.asScala
              .find(_.getPath.toDotString == column)
              .map(_.getStatistics)
              .filter(s => s != null && !s.isEmpty && s.hasNonNullValue)
              .collect { case s if s.genericGetMin.isInstanceOf[java.lang.Long] =>
                (s.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
                  s.genericGetMax.asInstanceOf[java.lang.Long].longValue())
              }
          }
          // a single missing row-group stat poisons the whole file's range
          val merged =
            if (ranges.isEmpty || ranges.exists(_.isEmpty)) None
            else Some((ranges.flatten.map(_._1).min, ranges.flatten.map(_._2).max))
          column -> merged
        }.toMap
        (p.toString, perCol)
      } finally reader.close()
    }
  }

  /** The files whose stats intersect EVERY requested `column -> [lo, hi]`
    * box side (files without stats are kept). Returns (kept, total).
    */
  def prunedFiles(spark: SparkSession, path: String,
                  box: Map[String, (Long, Long)]): (Seq[String], Int) = {
    val stats = fileStats(spark, path, box.keys.toSeq)
    val kept = stats.collect {
      case (f, perCol) if box.forall { case (c, (lo, hi)) =>
        perCol.getOrElse(c, None).forall { case (mn, mx) => mx >= lo && mn <= hi }
      } => f
    }
    (kept.sorted, stats.size)
  }

  /** Read the table scanning ONLY the files the box can touch, with the
    * box re-applied as a normal filter (pruning is an optimization, the
    * predicate still guards row-group/page pruning and exact semantics).
    */
  def readBox(spark: SparkSession, path: String,
              box: Map[String, (Long, Long)]): DataFrame = {
    val (kept, _) = prunedFiles(spark, path, box)
    val base =
      if (kept.isEmpty) spark.read.parquet(path).limit(0)
      else spark.read.parquet(kept: _*)
    box.foldLeft(base) { case (df, (c, (lo, hi))) =>
      df.filter(col(c) >= lo && col(c) <= hi)
    }
  }
}
