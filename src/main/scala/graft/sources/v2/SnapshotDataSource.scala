package graft.sources.v2

import java.util

import org.apache.spark.sql.{SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.SnapshotStore

/** DSv2 read path for [[graft.sources.SnapshotStore]] tables — time
  * travel from `spark.read` (and, via a temp view, from pure SQL text):
  *
  * {{{
  *   spark.read.format("graft.sources.v2.SnapshotDataSource")
  *     .option("versionAsOf", 3)      // omit for latest
  *     .load("/path/to/table")
  * }}}
  *
  * The provider resolves WHICH immutable parquet files are live at the
  * requested version from the commit log (one driver-side log replay,
  * zero data-file listing — the log IS the file index), then delegates
  * the entire scan to Spark's own parquet DSv2 machinery by handing
  * that file list to [[ParquetTable]]: column pruning, filter pushdown
  * to footers/pages, vectorized decode, and partition planning all
  * behave exactly as a native parquet read — this source adds metadata
  * resolution, not a scan implementation (same delegation move Delta
  * makes; `ParquetTable` is Spark's internal-but-public API, pinned by
  * SnapshotDataSourceSpec against upgrades).
  *
  * Read-only BY CONSTRUCTION: the returned table exposes only
  * `BATCH_READ`, so `df.write.format(...).save(table)` cannot bypass
  * the commit protocol ([[SnapshotStore.append]]/[[SnapshotStore.overwrite]]
  * are the write path; a raw parquet write into `data/` would corrupt
  * nothing anyway — unreferenced files are invisible — but failing fast
  * beats silently writing dead files).
  */
class SnapshotDataSource extends TableProvider
    with org.apache.spark.sql.sources.StreamSourceProvider {
  import SnapshotDataSource._

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    resolve(options).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val t = resolve(new CaseInsensitiveStringMap(properties))
    new SnapshotReadTable(t, t.name)
  }

  // ------------------------------------------------- streaming (v1 Source)
  // The batch table advertises BATCH_READ only, so DataStreamReader falls
  // back to this v1 provider — the contract whose getBatch returns a
  // DataFrame (the same one Delta's source uses), keeping the scan on
  // Spark's vectorized parquet path. See [[SnapshotStreamSource]].

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    val table = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-snapshot stream requires .load(<table path>)"))
    (s"graft-snapshot-stream($table)", schema.getOrElse(
      SnapshotStore.snapshot(sqlContext.sparkSession, table).schema))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): org.apache.spark.sql.execution.streaming.Source =
    SnapshotStreamSource(sqlContext.sparkSession, parameters,
      sourceSchema(sqlContext, schema, providerName, parameters)._2)
}

object SnapshotDataSource {
  val VersionAsOf = "versionAsOf"

  private def resolve(options: CaseInsensitiveStringMap): ParquetTable = {
    val spark = SparkSession.active
    val table = Option(options.get("path")).getOrElse(throw new
      IllegalArgumentException("graft-snapshot requires .load(<table path>)"))
    val asOf = Option(options.get(VersionAsOf)).map(_.toLong)
    val snap = SnapshotStore.state(spark, table, asOf)
    require(snap.live.nonEmpty, s"snapshot $table@v${snap.version} is empty")
    // recorded table schema (when present) pins the read: old files
    // null-fill mergeSchema'd columns instead of per-file inference
    ParquetTable(s"graft-snapshot($table@v${snap.version})", spark, options,
      snap.live.map(_.path),
      userSpecifiedSchema = SnapshotStore.tableSchema(spark, table, asOf),
      fallbackFileFormat = classOf[ParquetFileFormat])
  }
}

/** Read-only facade: delegates scanning to the resolved [[ParquetTable]]
  * while advertising only `BATCH_READ` (see [[SnapshotDataSource]]).
  */
class SnapshotReadTable(underlying: ParquetTable, tblName: String)
    extends Table with SupportsRead {
  override def name(): String = tblName
  override def schema(): StructType = underlying.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    underlying.newScanBuilder(options)
}
