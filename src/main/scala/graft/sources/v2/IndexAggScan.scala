package graft.sources.v2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** A pushed-aggregate scan whose rows ARE the final per-group answers,
  * precomputed at planning time from source metadata (a bag's chunk-info
  * index, a snapshot table's commit-log stats) — one tiny partition,
  * ZERO data-file reads. Complete pushdown: Spark projects these rows
  * directly, no partial aggregation above.
  */
class IndexAggScan(schema: StructType, rows: Array[Array[Any]], desc: String)
    extends Scan with Batch with PlanningAudit {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

  // the metadata I/O ran at PUSHDOWN time (pooled index reads / one log
  // replay); planInputPartitions itself is pure — rows are in hand
  override def planningDoesPerFileIO: Boolean = false
  override def planningParallel: Boolean = true

  override def planInputPartitions(): Array[InputPartition] =
    Array(IndexAggPartition(rows))
  override def createReaderFactory(): PartitionReaderFactory =
    new IndexAggReaderFactory(schema)
  override def description(): String = desc
}

/** Precomputed group rows (String / java.lang.Long / null values). */
case class IndexAggPartition(rows: Array[Array[Any]]) extends InputPartition

class IndexAggReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val rows = partition.asInstanceOf[IndexAggPartition].rows
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow =
        new GenericInternalRow(rows(i).map {
          case s: String => UTF8String.fromString(s)
          case v => v // java.lang.Long boxes unwrap fine; null stays null
        })
      override def close(): Unit = ()
    }
}
