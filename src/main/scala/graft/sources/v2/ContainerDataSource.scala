package graft.sources.v2

import java.nio.ByteBuffer
import java.nio.file.{Files, Paths}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 reader for the graft container format — the reference's
  * bag-file ingestion (service/app/main.py:87 `bagreader`) as a REAL
  * Spark source instead of binaryFile + parse expression:
  *
  * {{{
  *   spark.read.format("graft.sources.v2.ContainerDataSource")
  *     .load("/data/bags")      // one .bin container per bag
  * }}}
  *
  * Scale shape: one InputPartition PER CONTAINER FILE (bags parallelize
  * across the cluster exactly like the reference's one-task-per-bag
  * Fargate fan-out), rows are produced straight as InternalRow on the
  * executor, and COLUMN PRUNING is pushed into the reader
  * (SupportsPushDownRequiredColumns) — a `select(topic)` never
  * materializes payload bytes. Record layout is
  * [[graft.plans.ContainerCodec]]'s length-prefixed stream.
  */
class ContainerDataSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ContainerDataSource.fullSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ContainerTable(properties.get("path"))
}

object ContainerDataSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("bag_file", StringType),
    StructField("topic", StringType),
    StructField("ts_us", LongType),
    StructField("payload", BinaryType)))
}

class ContainerTable(path: String) extends Table with SupportsRead {
  require(path != null && path.nonEmpty, "graft-container source requires a path")

  override def name(): String = s"graft-container($path)"
  override def schema(): StructType = ContainerDataSource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ContainerScanBuilder(path)
}

class ContainerScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = ContainerDataSource.fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new ContainerScan(path, required)
}

class ContainerScan(path: String, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val dir = Paths.get(path)
    val files =
      if (Files.isDirectory(dir))
        Files.list(dir).iterator().asScala
          .filter(_.toString.endsWith(".bin")).map(_.toString).toArray.sorted
      else Array(path)
    files.map(f => ContainerPartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ContainerReaderFactory(required)
}

case class ContainerPartition(file: String) extends InputPartition

class ContainerReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ContainerPartitionReader(
      partition.asInstanceOf[ContainerPartition].file, required)
}

/** Streams one container file: decodes records lazily and projects only
  * the required columns (pruned payloads are skipped, not copied).
  */
class ContainerPartitionReader(file: String, required: StructType)
    extends PartitionReader[InternalRow] {

  private val bagFile =
    UTF8String.fromString(file.split('/').last.stripSuffix(".bin"))
  private val buf = ByteBuffer.wrap(Files.readAllBytes(Paths.get(file)))
  private val fieldIdx = required.fieldNames.map(
    ContainerDataSource.fullSchema.fieldNames.indexOf(_))
  private var row: InternalRow = _

  override def next(): Boolean = {
    if (buf.remaining() <= 0) return false
    val tlen = buf.getInt
    val needTopic = fieldIdx.contains(1)
    val topic = if (needTopic) {
      val tb = new Array[Byte](tlen); buf.get(tb); UTF8String.fromBytes(tb)
    } else { buf.position(buf.position() + tlen); null }
    val ts = buf.getLong
    val plen = buf.getInt
    val needPayload = fieldIdx.contains(3)
    val payload = if (needPayload) {
      val pb = new Array[Byte](plen); buf.get(pb); pb
    } else { buf.position(buf.position() + plen); null }
    row = new GenericInternalRow(fieldIdx.map {
      case 0 => bagFile
      case 1 => topic
      case 2 => ts
      case 3 => payload
    }.asInstanceOf[Array[Any]])
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}
