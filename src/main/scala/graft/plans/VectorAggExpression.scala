package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Element-wise MEAN of a vector column (`vec_mean`) — the embedding
  * centroid aggregate behind per-cluster/per-label statistics of an
  * embedding table (and the centroid-update step of a k-means round).
  *
  * Spark has no builtin element-wise array aggregate; the composable
  * alternative — posexplode → groupBy(key, pos) → avg → re-assemble —
  * shuffles n·dim rows. This aggregate keeps one (sums[dim], count)
  * buffer per group and participates in PARTIAL aggregation, so the
  * map side combines locally and the exchange carries k·dim doubles
  * (k = group count), independent of input rows — the shape that
  * matters at 100 TB.
  *
  * Accumulation is double regardless of input element width; null
  * vectors are ignored (SQL aggregate semantics), null ELEMENTS are
  * treated as 0 within a present vector; ragged dimensions fail loudly.
  * Buffers serialize as (count, dim, sums) for inter-stage shipping.
  */
case class VectorMean(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorMean.Buffer] with UnaryLike[Expression] {

  private lazy val elementIsFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def prettyName: String = "vec_mean"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_mean requires array<float> or array<double>, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): VectorMean.Buffer =
    new VectorMean.Buffer(0L, null)

  override def update(buf: VectorMean.Buffer, input: InternalRow): VectorMean.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (buf.sums == null) buf.sums = new Array[Double](n)
      else if (buf.sums.length != n) throw new IllegalArgumentException(
        s"vec_mean: ragged vector dimensions ${buf.sums.length} vs $n")
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          buf.sums(i) += (if (elementIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
        }
        i += 1
      }
      buf.count += 1
    }
    buf
  }

  override def merge(buf: VectorMean.Buffer, other: VectorMean.Buffer): VectorMean.Buffer = {
    if (other.sums != null) {
      if (buf.sums == null) { buf.sums = other.sums.clone(); buf.count = other.count }
      else {
        if (buf.sums.length != other.sums.length) throw new IllegalArgumentException(
          s"vec_mean: ragged vector dimensions ${buf.sums.length} vs ${other.sums.length}")
        var i = 0
        while (i < buf.sums.length) { buf.sums(i) += other.sums(i); i += 1 }
        buf.count += other.count
      }
    }
    buf
  }

  override def eval(buf: VectorMean.Buffer): Any =
    if (buf.sums == null || buf.count == 0L) null
    else new GenericArrayData(buf.sums.map(_ / buf.count))

  override def serialize(buf: VectorMean.Buffer): Array[Byte] = {
    val dim = if (buf.sums == null) -1 else buf.sums.length
    val bb = ByteBuffer.allocate(8 + 4 + math.max(dim, 0) * 8)
    bb.putLong(buf.count).putInt(dim)
    if (dim > 0) buf.sums.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorMean.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val count = bb.getLong
    val dim = bb.getInt
    val sums = if (dim < 0) null else Array.fill(dim)(bb.getDouble)
    new VectorMean.Buffer(count, sums)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMean =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMean =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorMean =
    copy(child = newChild)
}

object VectorMean {
  /** Mutable partial state: running element sums + contributing rows. */
  final class Buffer(var count: Long, var sums: Array[Double])
}
