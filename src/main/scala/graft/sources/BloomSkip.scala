package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FILE-LEVEL point-lookup skipping via parquet's own bloom filters —
  * the data-skipping complement to [[ZOrderStore]]'s min/max pruning:
  * min/max boxes prune RANGE predicates but are useless for equality on
  * a high-cardinality, hash-distributed id (every file's [min,max]
  * spans the domain); a per-column bloom answers "can this file contain
  * id = x?" directly.
  *
  * The blooms are the STANDARD parquet ones (format spec, written with
  * `parquet.bloom.filter.enabled#<col>` — [[ZOrderStore.writeN]] takes
  * a `bloomCols` list), so any engine benefits; Spark's reader already
  * consults them per ROW GROUP once a file is opened. What it lacks is
  * the file-level index: [[prunedFiles]] reads ONLY footers + bloom
  * headers (a few KB per file) and drops whole files before the scan
  * plans — at 100 TB the same role [[ZOrderStore.fileStats]] plays for
  * boxes, and like it, production systems would persist this index in a
  * manifest rather than re-read footers per query.
  *
  * When a chunk carries NO bloom, the DICTIONARY stands in: parquet-mr
  * deliberately skips bloom writing for fully dictionary-encoded chunks
  * (the dictionary is an exact membership list — zero false positives),
  * so this prober mirrors parquet's own DictionaryFilter and scans the
  * dictionary page when the chunk's encoding stats prove every data
  * page is dictionary-encoded. A chunk with neither bloom nor complete
  * dictionary keeps its file (never skip blind); values hash/compare by
  * the column's parquet primitive type. False positives only cost a
  * scanned file — never correctness — and [[readPoints]] re-applies the
  * predicate regardless.
  */
object BloomSkip {

  /** The files whose blooms/dictionaries might contain ANY of `values`
    * for `column` (kept conservatively when neither is usable).
    * Returns (kept, total).
    */
  def prunedFiles(spark: SparkSession, path: String, column: String,
                  values: Seq[Any]): (Seq[String], Int) = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(path).getFileSystem(conf)
    val files = fs.listStatus(new Path(path)).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath)
    (prunedFrom(conf, files, column, values).map(_.toString).sorted, files.size)
  }

  /** [[prunedFiles]] over an EXPLICIT file list — the form a
    * log-resolved table ([[SnapshotStore.readPoints]]) probes, where the
    * commit log already names the live files and a directory listing
    * would see stranded/stale ones.
    */
  def prunedFrom(conf: org.apache.hadoop.conf.Configuration,
                 files: Seq[Path], column: String,
                 values: Seq[Any]): Seq[Path] = {
    require(values.nonEmpty, "bloom probe needs at least one value")
    import scala.jdk.CollectionConverters._
    files.filter { p =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try {
        val schema = reader.getFooter.getFileMetaData.getSchema
        val blocks = reader.getFooter.getBlocks.asScala.toSeq
        blocks.exists { block =>
          block.getColumns.asScala.find(_.getPath.toDotString == column) match {
            case None => true // column absent: keep, let the scan decide
            case Some(cc) =>
              val tpe = cc.getPrimitiveType.getPrimitiveTypeName
              val bloom = reader.getBloomFilterDataReader(block).readBloomFilter(cc)
              if (bloom != null) {
                values.exists(v => bloom.findHash(hashFor(bloom, tpe, v)))
              } else if (cc.getEncodingStats != null &&
                  !cc.getEncodingStats.hasNonDictionaryEncodedPages) {
                // exact membership via the dictionary (parquet wrote no
                // bloom BECAUSE the dictionary already answers this)
                val desc = schema.getColumnDescription(cc.getPath.toArray)
                // the concrete reader class is package-private; go through
                // the public DictionaryPageReadStore interface
                val store: org.apache.parquet.column.page.DictionaryPageReadStore =
                  reader.getDictionaryReader(block)
                val page = store.readDictionaryPage(desc)
                if (page == null) true
                else {
                  val dict = page.getEncoding.initDictionary(desc, page)
                  (0 to dict.getMaxId).exists { i =>
                    values.exists(v => dictEquals(dict, i, tpe, v))
                  }
                }
              } else true // neither bloom nor complete dictionary: keep
          }
        }
      } finally reader.close()
    }
  }

  private def hashFor(bloom: org.apache.parquet.column.values.bloomfilter.BloomFilter,
                      tpe: PrimitiveTypeName, v: Any): Long = (tpe, v) match {
    case (PrimitiveTypeName.INT64, x: Long) => bloom.hash(x)
    case (PrimitiveTypeName.INT64, x: Int) => bloom.hash(x.toLong)
    case (PrimitiveTypeName.INT32, x: Int) => bloom.hash(x)
    case (PrimitiveTypeName.INT32, x: Long) => bloom.hash(x.toInt)
    case (PrimitiveTypeName.DOUBLE, x: Double) => bloom.hash(x)
    case (PrimitiveTypeName.FLOAT, x: Float) => bloom.hash(x)
    case (PrimitiveTypeName.BINARY, x: String) => bloom.hash(Binary.fromString(x))
    case (t, x) => throw new IllegalArgumentException(
      s"BloomSkip: cannot hash $x (${x.getClass.getSimpleName}) against parquet type $t")
  }

  private def dictEquals(dict: org.apache.parquet.column.Dictionary, i: Int,
                         tpe: PrimitiveTypeName, v: Any): Boolean = (tpe, v) match {
    case (PrimitiveTypeName.INT64, x: Long) => dict.decodeToLong(i) == x
    case (PrimitiveTypeName.INT64, x: Int) => dict.decodeToLong(i) == x.toLong
    case (PrimitiveTypeName.INT32, x: Int) => dict.decodeToInt(i) == x
    case (PrimitiveTypeName.INT32, x: Long) => dict.decodeToInt(i) == x.toInt
    case (PrimitiveTypeName.DOUBLE, x: Double) => dict.decodeToDouble(i) == x
    case (PrimitiveTypeName.FLOAT, x: Float) => dict.decodeToFloat(i) == x
    case (PrimitiveTypeName.BINARY, x: String) =>
      dict.decodeToBinary(i) == Binary.fromString(x)
    case (t, x) => throw new IllegalArgumentException(
      s"BloomSkip: cannot compare $x (${x.getClass.getSimpleName}) against parquet type $t")
  }

  /** Read the table scanning ONLY files whose blooms can contain one of
    * `values`, with the IN-predicate re-applied (bloom skipping is an
    * optimization; the filter still guards row-group pruning and exact
    * semantics). An empty keep-list short-circuits to an empty result
    * with the table's schema.
    */
  def readPoints(spark: SparkSession, path: String, column: String,
                 values: Seq[Any]): DataFrame = {
    val (kept, _) = prunedFiles(spark, path, column, values)
    val base =
      if (kept.isEmpty) spark.read.parquet(path).limit(0)
      else spark.read.parquet(kept: _*)
    base.filter(col(column).isin(values: _*))
  }
}
