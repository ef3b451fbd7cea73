package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, StructField, StructType}

/** Group-wise TOP-K as a hash aggregate (`top_k(ord, payload, k)`) — the
  * k-generalization of the struct-max argmax trick: each group keeps a
  * bounded min-heap of the k largest `ord` values with their payloads,
  * and the result is the heap sorted DESCENDING as
  * `array<struct<ord, val>>`.
  *
  * The window formulation (`row_number() OVER (PARTITION BY g ORDER BY
  * o DESC) <= k`) shuffles EVERY row to its group's partition and sorts
  * the whole partition before discarding all but k rows. This aggregate
  * participates in PARTIAL aggregation: the map side reduces each
  * partition to ≤ groups·k entries before the exchange, so shuffle
  * volume is independent of input rows — at 100 TB the window form
  * moves the full fact table, this moves k rows per group.
  *
  * `ord` may be any orderable type; compound orderings ride a struct
  * (struct comparison is lexicographic by field, so ties break on the
  * later fields — DESC on every field under the descending emit). Rows
  * with null `ord` are ignored (SQL aggregate semantics); null payloads
  * are kept. k must be a positive literal; buffers serialize via an
  * UnsafeProjection over (ord, payload) for inter-stage shipping.
  */
case class TopK(
    ord: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopK.Buffer] with BinaryLike[Expression] {

  override def left: Expression = ord
  override def right: Expression = payload

  override def prettyName: String = "top_k"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("ord", ord.dataType, nullable = false),
      StructField("val", payload.dataType, nullable = true))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!RowOrdering.isOrderable(ord.dataType)) TypeCheckResult.TypeCheckFailure(
      s"top_k ordering type ${ord.dataType.simpleString} is not orderable")
    else if (k < 1) TypeCheckResult.TypeCheckFailure(s"top_k requires k >= 1, got $k")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(ord.dataType)

  @transient private lazy val pairProjection: UnsafeProjection =
    UnsafeProjection.create(Array(ord.dataType, payload.dataType))

  @transient private lazy val ordGetter =
    InternalRow.getAccessor(ord.dataType, nullable = false)
  @transient private lazy val payloadGetter =
    InternalRow.getAccessor(payload.dataType, nullable = true)

  override def createAggregationBuffer(): TopK.Buffer = new TopK.Buffer(k)

  override def update(buf: TopK.Buffer, input: InternalRow): TopK.Buffer = {
    val o = ord.eval(input)
    if (o != null) {
      // copy-on-keep only: a row that can't beat the heap minimum costs
      // one comparison and zero allocation — the hot path once the heap
      // is warm
      if (buf.size < k) {
        buf.insert(InternalRow.copyValue(o), InternalRow.copyValue(payload.eval(input)), ordering)
      } else if (ordering.compare(o, buf.ords(0)) > 0) {
        buf.replaceMin(InternalRow.copyValue(o), InternalRow.copyValue(payload.eval(input)), ordering)
      }
    }
    buf
  }

  override def merge(buf: TopK.Buffer, other: TopK.Buffer): TopK.Buffer = {
    // streaming state restore can hand the SAME buffer object as both
    // sides (observed: complete-mode aggregation); merging a heap with
    // itself while mutating it duplicates the max — identity is a no-op
    if (buf eq other) return buf
    var i = 0
    while (i < other.size) {
      if (buf.size < k) buf.insert(other.ords(i), other.vals(i), ordering)
      else if (ordering.compare(other.ords(i), buf.ords(0)) > 0) {
        buf.replaceMin(other.ords(i), other.vals(i), ordering)
      }
      i += 1
    }
    buf
  }

  override def eval(buf: TopK.Buffer): Any = {
    val idx = Array.range(0, buf.size)
      .sortWith((a, b) => ordering.compare(buf.ords(a), buf.ords(b)) > 0)
    new GenericArrayData(idx.map { i =>
      new GenericInternalRow(Array[Any](buf.ords(i), buf.vals(i)))
    })
  }

  override def serialize(buf: TopK.Buffer): Array[Byte] = {
    val proj = pairProjection
    val pair = new GenericInternalRow(2)
    val rows = new Array[Array[Byte]](buf.size)
    var total = 4
    var i = 0
    while (i < buf.size) {
      pair.update(0, buf.ords(i))
      pair.update(1, buf.vals(i))
      // proj reuses one buffer and getBytes returns the BACKING ARRAY
      // when the size matches exactly — copy() forces a private array or
      // every entry aliases the last row's bytes
      rows(i) = proj(pair).copy().getBytes
      total += 4 + rows(i).length
      i += 1
    }
    val bb = ByteBuffer.allocate(total)
    bb.putInt(buf.size)
    rows.foreach { r => bb.putInt(r.length); bb.put(r) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopK.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopK.Buffer(k)
    val row = new UnsafeRow(2)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val off = bb.position()
      row.pointTo(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off, len)
      bb.position(off + len)
      // copy out of the reused row view; a merge may retain these values
      buf.insert(InternalRow.copyValue(ordGetter(row, 0)),
        InternalRow.copyValue(payloadGetter(row, 1)), ordering)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): TopK =
    copy(ord = newLeft, payload = newRight)
}

object TopK {
  /** Bounded binary MIN-heap by `ord` — root is the smallest kept entry,
    * i.e. the eviction candidate. Parallel arrays, no per-entry boxes.
    */
  final class Buffer(k: Int) {
    val ords = new Array[Any](k)
    val vals = new Array[Any](k)
    var size = 0

    def insert(o: Any, v: Any, ordering: Ordering[Any]): Unit = {
      var i = size
      ords(i) = o
      vals(i) = v
      size += 1
      // sift up
      while (i > 0 && ordering.compare(ords(i), ords((i - 1) / 2)) < 0) {
        swap(i, (i - 1) / 2)
        i = (i - 1) / 2
      }
    }

    def replaceMin(o: Any, v: Any, ordering: Ordering[Any]): Unit = {
      ords(0) = o
      vals(0) = v
      // sift down
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = 2 * i + 2
        var m = i
        if (l < size && ordering.compare(ords(l), ords(m)) < 0) m = l
        if (r < size && ordering.compare(ords(r), ords(m)) < 0) m = r
        if (m == i) done = true
        else { swap(i, m); i = m }
      }
    }

    private def swap(a: Int, b: Int): Unit = {
      val to = ords(a); ords(a) = ords(b); ords(b) = to
      val tv = vals(a); vals(a) = vals(b); vals(b) = tv
    }
  }
}
