package graft.sources.v2

import java.io.DataInputStream
import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.sql.SparkSession

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
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
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    // the SESSION's hadoop conf (spark.hadoop.* — object-store creds,
    // endpoints) must reach both driver-side listing and executor-side
    // readers; a bare `new Configuration()` would drop it all
    new ContainerScanBuilder(path,
      new SerializableHadoopConf(SparkSession.active.sessionState.newHadoopConf()))
}

/** Minimal serializable Hadoop Configuration carrier (the spark-core
  * equivalent is private[spark]). */
class SerializableHadoopConf(@transient var value: Configuration) extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject(); value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject(); value = new Configuration(false); value.readFields(in)
  }
}

class ContainerScanBuilder(path: String, hconf: SerializableHadoopConf)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  import org.apache.spark.sql.sources.{EqualTo, Filter, In, IsNotNull}

  private var required: StructType = ContainerDataSource.fullSchema
  private var pushedTopics: Option[Set[String]] = None
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Topic equality/IN predicates evaluate INSIDE the reader — records
    * of foreign topics are skipped at decode time without copying their
    * payload bytes (the reference reads one topic of a bag the same way:
    * main.py:92 `message_by_topic`). Everything else stays a residual
    * filter for Spark.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case EqualTo("topic", _: String) => true
      case In("topic", vs) => vs.forall(_.isInstanceOf[String])
      case IsNotNull("topic") => true // the format never yields null topics
      case _ => false
    }
    pushedTopics = accepted.foldLeft(Option.empty[Set[String]]) { (acc, f) =>
      f match {
        case EqualTo(_, v: String) =>
          Some(acc.fold(Set(v))(_ intersect Set(v)))
        case In(_, vs) =>
          val ts = vs.map(_.asInstanceOf[String]).toSet
          Some(acc.fold(ts)(_ intersect ts))
        case _ => acc // IsNotNull constrains nothing
      }
    }
    pushed = accepted
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new ContainerScan(path, hconf, required, pushedTopics)
}

class ContainerScan(path: String, hconf: SerializableHadoopConf,
                    required: StructType,
                    topicFilter: Option[Set[String]] = None)
    extends Scan with Batch with PlanningAudit {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  // planning is ONE directory listing; no per-file I/O to pool
  override def planningDoesPerFileIO: Boolean = false
  override def planningParallel: Boolean = true

  override def planInputPartitions(): Array[InputPartition] =
    ContainerScan.listFiles(path, hconf.value)
      .map(f => ContainerPartition(f): InputPartition)

  override def createReaderFactory(): PartitionReaderFactory =
    new ContainerReaderFactory(required, topicFilter, hconf)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new ContainerMicroBatchStream(path, hconf, required, topicFilter)
}

object ContainerScan {
  /** Hadoop FileSystem listing — the path can be local, HDFS, or any
    * object store with a Hadoop connector (the reference reads bags off
    * S3; a path scheme is all that changes here).
    */
  def listFiles(path: String, conf: Configuration): Array[String] = {
    val p = new HPath(path)
    val fs = p.getFileSystem(conf)
    if (fs.getFileStatus(p).isDirectory)
      fs.listStatus(p).filter(st => st.isFile && st.getPath.getName.endsWith(".bin"))
        .map(_.getPath.toString).sorted
    else Array(path)
  }
}

/** One arriving container file = one micro-batch unit — the streaming
  * form of the reference's batch trigger (an S3 bag upload fires the
  * pipeline: infrastructure/emr_trigger). Append-only directories only,
  * like every file-based source.
  */
class ContainerMicroBatchStream(path: String, hconf: SerializableHadoopConf,
                                required: StructType,
                                topicFilter: Option[Set[String]])
    extends MicroBatchStream {

  // The offset IS the ordered list of files processed so far — restart-
  // safe by construction: a late arrival that sorts lexicographically
  // early (bag_10 < bag_2) cannot shift committed positions, because a
  // deserialized checkpoint offset re-seeds the discovery order before
  // any new listing is merged in.
  private val discovered = scala.collection.mutable.ArrayBuffer[String]()
  private val known = scala.collection.mutable.HashSet[String]()

  private def merge(files: Seq[String]): Unit = synchronized {
    files.foreach { f => if (known.add(f)) discovered += f }
  }

  override def initialOffset(): Offset = ContainerOffset(Nil)

  override def latestOffset(): Offset = {
    merge(ContainerScan.listFiles(path, hconf.value).toSeq)
    synchronized { ContainerOffset(discovered.toList) }
  }

  override def deserializeOffset(json: String): Offset = {
    if (!json.trim.startsWith("["))
      throw new IllegalStateException(
        "graft-container checkpoint offset is not a file-list (pre-file-list " +
          "format or foreign checkpoint) — rebuild the checkpoint directory")
    val files = ContainerOffset.mapper
      .readValue(json, classOf[Array[String]]).toSeq
    merge(files) // checkpointed order seeds discovery before new listings
    ContainerOffset(files)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ContainerOffset].files
    val e = end.asInstanceOf[ContainerOffset].files
    // the start list must be a prefix of the end list — anything else means
    // a foreign/edited checkpoint or out-of-band directory mutation, and
    // dropping by length would silently reprocess or skip files
    if (!e.startsWith(s))
      throw new IllegalStateException(
        s"graft-container offsets diverge: start list ${s.take(3).mkString(",")}… is not a " +
          s"prefix of end list ${e.take(3).mkString(",")}… — the checkpoint does not match " +
          "this directory's discovery order; rebuild the checkpoint directory")
    e.drop(s.length).toArray.map(f => ContainerPartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ContainerReaderFactory(required, topicFilter, hconf)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** The processed-file list IS the offset: restart-order-safe, at the
  * cost of offset size growing with the directory. Containers arrive in
  * per-batch directories in the reference's layout (bag_parquets/<batch>),
  * which bounds the list; for a truly unbounded single directory, rotate
  * the source path per batch window.
  */
case class ContainerOffset(files: Seq[String]) extends Offset {
  override def json(): String = ContainerOffset.mapper.writeValueAsString(files.toArray)
}

object ContainerOffset {
  val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
}

case class ContainerPartition(file: String) extends InputPartition

class ContainerReaderFactory(required: StructType,
                             topicFilter: Option[Set[String]],
                             hconf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ContainerPartitionReader(
      partition.asInstanceOf[ContainerPartition].file, required, topicFilter,
      hconf.value)
}

/** Streams one container file record by record over a (buffered) Hadoop
  * input stream — a multi-GB bag never materializes in memory, pruned
  * payloads and filtered-out records are `skip`ped, not copied.
  */
class ContainerPartitionReader(file: String, required: StructType,
                               topicFilter: Option[Set[String]],
                               conf: Configuration)
    extends PartitionReader[InternalRow] {

  private val hPath = new HPath(file)
  private val bagFile =
    UTF8String.fromString(hPath.getName.stripSuffix(".bin"))
  private val fs = hPath.getFileSystem(conf)
  private val totalLen = fs.getFileStatus(hPath).getLen
  private val in = new DataInputStream(
    new java.io.BufferedInputStream(fs.open(hPath), 1 << 16))
  private var pos = 0L
  private val fieldIdx = required.fieldNames.map(
    ContainerDataSource.fullSchema.fieldNames.indexOf(_))
  private val wantedTopics = topicFilter.map(_.map(UTF8String.fromString))
  private var row: InternalRow = _

  private def skipFully(n: Long): Unit = {
    var left = n
    while (left > 0) {
      val s = in.skip(left)
      if (s <= 0) throw new java.io.EOFException(s"truncated container $file")
      left -= s
    }
  }

  @annotation.tailrec
  final override def next(): Boolean = {
    if (pos >= totalLen) return false
    val tlen = in.readInt()
    // the pushed topic filter needs the topic regardless of pruning
    val needTopic = fieldIdx.contains(1) || wantedTopics.isDefined
    val topic = if (needTopic) {
      val tb = new Array[Byte](tlen); in.readFully(tb); UTF8String.fromBytes(tb)
    } else { skipFully(tlen); null }
    if (wantedTopics.exists(w => !w.contains(topic))) {
      skipFully(8) // ts
      val skip = in.readInt()
      skipFully(skip)
      pos += 4L + tlen + 8 + 4 + skip
      next()
    } else {
      val ts = in.readLong()
      val plen = in.readInt()
      val needPayload = fieldIdx.contains(3)
      val payload = if (needPayload) {
        val pb = new Array[Byte](plen); in.readFully(pb); pb
      } else { skipFully(plen); null }
      pos += 4L + tlen + 8 + 4 + plen
      row = new GenericInternalRow(fieldIdx.map {
        case 0 => bagFile
        case 1 => topic
        case 2 => ts
        case 3 => payload
      }.asInstanceOf[Array[Any]])
      true
    }
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}
