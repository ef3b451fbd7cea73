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

  /** Unsigned UTF-8 byte-order comparison — the order parquet binary
    * stats are computed in and the order Spark's UTF8String residual
    * filters use. Java String (UTF-16 code unit) order DISAGREES for
    * supplementary characters (a surrogate pair sorts below U+E000+ in
    * UTF-16 but above in UTF-8 bytes), so every merge or prune over
    * harvested string stats must compare here, or pruning can drop a
    * file whose rows satisfy the predicate.
    */
  private[sources] def utf8Cmp(a: String, b: String): Int = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xFF) - (y(i) & 0xFF)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  private[sources] val Utf8Ordering: Ordering[String] =
    (a: String, b: String) => utf8Cmp(a, b)

  /** Write `df` z-ordered by (colA, colB) into `numFiles` files. */
  def write(df: DataFrame, colA: String, colB: String, path: String,
            numFiles: Int): Unit =
    writeN(df, Seq(colA, colB), path, numFiles)

  /** [[write]] over 2 OR 3 clustering columns
    * ([[graft.functions.ZOrder.zorderCols]] — 31 or 21 bits per
    * dimension). Three dimensions trade per-dimension resolution for a
    * third pruned predicate: each file's box is a 3-D tile, so a
    * 3-predicate box query prunes on all three sides at file AND
    * row-group granularity.
    */
  def writeN(df: DataFrame, cols: Seq[String], path: String,
             numFiles: Int, bloomCols: Seq[String] = Nil): Unit = {
    val writer = df.withColumn("__z", ZOrder.zorderCols(cols.map(col)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite")
    // standard parquet blooms per requested column — the file-level
    // point-lookup index [[BloomSkip]] prunes on (and Spark's own reader
    // consults per row group once a file is opened)
    bloomCols.foldLeft(writer) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
    }.parquet(path)
  }

  /** One ROW GROUP's footprint: row count + per-column [min,max] (None
    * when the block lacks usable long stats — callers must keep such
    * blocks, never skip blind).
    */
  final case class RowGroupStat(index: Int, rows: Long,
                                ranges: Map[String, Option[(Long, Long)]])

  /** Per-row-group [min,max] of long columns, straight from parquet
    * footers — ONE footer read per file serves all columns and both
    * granularities ([[fileStats]] merges these per file).
    */
  def rowGroupStats(spark: SparkSession, path: String, columns: Seq[String])
      : Seq[(String, Seq[RowGroupStat])] = {
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
        val stats = blocks.zipWithIndex.map { case (block, i) =>
          val ranges = columns.map { column =>
            column -> block.getColumns.asScala
              .find(_.getPath.toDotString == column)
              .map(_.getStatistics)
              .filter(s => s != null && !s.isEmpty && s.hasNonNullValue)
              .collect { case s if s.genericGetMin.isInstanceOf[java.lang.Long] =>
                (s.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
                  s.genericGetMax.asInstanceOf[java.lang.Long].longValue())
              }
          }.toMap
          RowGroupStat(i, block.getRowCount, ranges)
        }
        (p.toString, stats)
      } finally reader.close()
    }
  }

  /** Per-file [min,max] of long columns: [[rowGroupStats]] merged per
    * file. A column maps to None when any row group lacks usable
    * stats — callers must keep such files, never skip blind.
    */
  def fileStats(spark: SparkSession, path: String, columns: Seq[String])
      : Seq[(String, Map[String, Option[(Long, Long)]])] =
    rowGroupStats(spark, path, columns).map { case (f, blocks) =>
      val perCol = columns.map { column =>
        val ranges = blocks.map(_.ranges(column))
        // a single missing row-group stat poisons the whole file's range
        val merged =
          if (ranges.isEmpty || ranges.exists(_.isEmpty)) None
          else Some((ranges.flatten.map(_._1).min, ranges.flatten.map(_._2).max))
        column -> merged
      }.toMap
      (f, perCol)
    }

  /** Per-file NULL COUNTS — the third leg of the footer harvest (rows +
    * [min,max] + nulls is Delta's stats triple). A column maps to None
    * when any row group's footer lacks a set null count (ancient
    * writers) — consumers must treat None as unknown, never as zero.
    * Works for every column TYPE (null counts are type-agnostic), so
    * this also covers columns whose min/max legs are absent.
    */
  def fileNullCounts(spark: SparkSession, path: String, columns: Seq[String])
      : Seq[(String, Map[String, Option[Long]])] = {
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
          val counts = blocks.map { block =>
            block.getColumns.asScala
              .find(_.getPath.toDotString == column)
              .map(_.getStatistics)
              .filter(st => st != null && st.isNumNullsSet)
              .map(_.getNumNulls)
          }
          val merged =
            if (counts.isEmpty || counts.exists(_.isEmpty)) None
            else Some(counts.flatten.sum)
          column -> merged
        }.toMap
        (p.toString, perCol)
      } finally reader.close()
    }
  }

  /** Per-file [min,max] of STRING (parquet Binary/UTF-8) columns — the
    * string leg of [[fileStats]]. A column maps to None when any row
    * group lacks usable binary stats.
    */
  def fileStringStats(spark: SparkSession, path: String, columns: Seq[String])
      : Seq[(String, Map[String, Option[(String, String)]])] = {
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
              .filter(st => st != null && !st.isEmpty && st.hasNonNullValue)
              .collect {
                case st if st.genericGetMin.isInstanceOf[org.apache.parquet.io.api.Binary] =>
                  (st.genericGetMin.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8,
                    st.genericGetMax.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8)
              }
          }
          val merged = // cross-block min/max in UTF-8 byte order (see utf8Cmp)
            if (ranges.isEmpty || ranges.exists(_.isEmpty)) None
            else Some((ranges.flatten.map(_._1).min(Utf8Ordering),
              ranges.flatten.map(_._2).max(Utf8Ordering)))
          column -> merged
        }.toMap
        (p.toString, perCol)
      } finally reader.close()
    }
  }

  /** One file's full footer harvest: rows + long [min,max] + string
    * [min,max] + null counts — everything a snapshot commit records.
    */
  final case class FooterStats(rows: Long,
                               longs: Map[String, Option[(Long, Long)]],
                               strings: Map[String, Option[(String, String)]],
                               nulls: Map[String, Option[Long]])

  /** The staging path's whole stats harvest from ONE
    * `ParquetFileReader.open` per file. Semantics match the single-leg
    * harvests exactly ([[fileStats]]/[[fileStringStats]]/
    * [[fileNullCounts]] + row totals): a column's range is None when
    * any row group lacks usable stats of that type, null counts sum or
    * None, string ranges merge in UTF-8 byte order. Exists because the
    * four separate calls each re-open and re-parse every footer — a
    * commit staging N small files paid 4N footer parses, a measured
    * slice of the flat ~200 ms per-commit overhead
    * (CommitCostProbe r18).
    */
  def fileFooterStats(spark: SparkSession, path: String, columns: Seq[String])
      : Seq[(String, FooterStats)] = {
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
        def statsOf(column: String) = blocks.map { block =>
          block.getColumns.asScala.find(_.getPath.toDotString == column)
            .map(_.getStatistics)
        }
        val longs = columns.map { column =>
          val ranges = statsOf(column).map(_
            .filter(s => s != null && !s.isEmpty && s.hasNonNullValue)
            .collect { case s if s.genericGetMin.isInstanceOf[java.lang.Long] =>
              (s.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
                s.genericGetMax.asInstanceOf[java.lang.Long].longValue())
            })
          val merged =
            if (ranges.isEmpty || ranges.exists(_.isEmpty)) None
            else Some((ranges.flatten.map(_._1).min, ranges.flatten.map(_._2).max))
          column -> merged
        }.toMap
        val strings = columns.map { column =>
          val ranges = statsOf(column).map(_
            .filter(st => st != null && !st.isEmpty && st.hasNonNullValue)
            .collect {
              case st if st.genericGetMin.isInstanceOf[org.apache.parquet.io.api.Binary] =>
                (st.genericGetMin.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8,
                  st.genericGetMax.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8)
            })
          val merged =
            if (ranges.isEmpty || ranges.exists(_.isEmpty)) None
            else Some((ranges.flatten.map(_._1).min(Utf8Ordering),
              ranges.flatten.map(_._2).max(Utf8Ordering)))
          column -> merged
        }.toMap
        val nulls = columns.map { column =>
          val counts = statsOf(column).map(_
            .filter(st => st != null && st.isNumNullsSet)
            .map(_.getNumNulls))
          val merged =
            if (counts.isEmpty || counts.exists(_.isEmpty)) None
            else Some(counts.flatten.sum)
          column -> merged
        }.toMap
        (p.toString, FooterStats(blocks.map(_.getRowCount).sum, longs, strings, nulls))
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

  /** Compact a fragmented z-ordered table into ~`targetFileBytes` files,
    * preserving the z-clustering — the maintenance pass every streaming
    * or incremental ingest needs (micro-batches write small files; small
    * files wreck scan throughput AND footer-pruning selectivity, because
    * per-file boxes of interleaved appends overlap arbitrarily).
    * Re-sorting by the Morton code restores disjoint z-tiles, so
    * [[prunedFiles]] is sharp again after compaction.
    *
    * Returns (filesBefore, filesAfter). The rewrite goes through a
    * sibling temp dir + rename (Hadoop FS API, works on HDFS/S3/file:);
    * the swap is NOT transactional — a production lakehouse commits via
    * manifest swap instead, which is a metadata-layer concern above this
    * operator.
    */
  def compact(spark: SparkSession, path: String, colA: String, colB: String,
              targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) =
    compactN(spark, path, Seq(colA, colB), targetFileBytes)

  /** [[compact]] over 2 or 3 clustering columns (the [[writeN]] twin). */
  def compactN(spark: SparkSession, path: String, cols: Seq[String],
               targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val parts = fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val before = parts.size
    val totalBytes = parts.map(_.getLen).sum
    val after = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val tmp = new Path(p.getParent, p.getName + ".compact.tmp")
    val df = spark.read.parquet(path)
    writeN(df, cols, tmp.toString, after)
    fs.delete(p, true)
    if (!fs.rename(tmp, p)) {
      throw new IllegalStateException(s"compact: rename $tmp -> $p failed")
    }
    (before, after)
  }

  /** Prune accounting at BOTH granularities for a box query.
    *
    * File-level numbers drive [[readBox]]'s scan list; row-group numbers
    * are what the parquet reader's own predicate pushdown will skip
    * INSIDE the kept files (same footer stats), so `keptRows` is the
    * true upper bound on rows the scan touches. The gap between
    * `keptFiles`-implied rows and `keptRows` is exactly what per-file
    * merged boxes give away inside big files — the sharpening the
    * z-order layout exists to maximize.
    */
  final case class PruneReport(totalFiles: Int, keptFiles: Int,
                               totalRowGroups: Int, keptRowGroups: Int,
                               totalRows: Long, keptRows: Long)

  def pruneReport(spark: SparkSession, path: String,
                  box: Map[String, (Long, Long)]): PruneReport = {
    val stats = rowGroupStats(spark, path, box.keys.toSeq)
    def hits(ranges: Map[String, Option[(Long, Long)]]): Boolean =
      box.forall { case (c, (lo, hi)) =>
        ranges.getOrElse(c, None).forall { case (mn, mx) => mx >= lo && mn <= hi }
      }
    val perFile = stats.map { case (_, blocks) =>
      val kept = blocks.filter(b => hits(b.ranges))
      // file-level keep mirrors prunedFiles: the MERGED box (min of mins,
      // max of maxs) intersects — which can hold even when no single
      // block intersects; that over-keep is the per-file granularity loss
      val mergedKeep = box.forall { case (c, (lo, hi)) =>
        val ranges = blocks.map(_.ranges.getOrElse(c, None))
        if (ranges.isEmpty || ranges.exists(_.isEmpty)) true
        else ranges.flatten.map(_._2).max >= lo && ranges.flatten.map(_._1).min <= hi
      }
      (blocks.size, kept.size, blocks.map(_.rows).sum, kept.map(_.rows).sum, mergedKeep)
    }
    PruneReport(
      totalFiles = perFile.size,
      keptFiles = perFile.count(_._5),
      totalRowGroups = perFile.map(_._1).sum,
      keptRowGroups = perFile.map(_._2).sum,
      totalRows = perFile.map(_._3).sum,
      keptRows = perFile.map(_._4).sum)
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
