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

/** Element-wise WEIGHTED mean (`vec_weighted_mean(vec, w)`) — the same
  * (sums[dim], Σw) partial-aggregation shape as [[VectorMean]], with each
  * vector scaled by its row weight. The centroid consumer: weighting doc
  * embeddings by token count makes the centroid describe the token MASS
  * of a corpus slice rather than its document count — the quantity that
  * matters when slices feed a token-budgeted training mix.
  *
  * Rows with a null vector or null weight are skipped (SQL semantics);
  * zero total weight yields null. Accumulation is double; the exchange
  * carries k·dim doubles regardless of input rows.
  */
case class VectorWeightedMean(
    vec: Expression,
    weight: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorWeightedMean.Buffer]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  override def left: Expression = vec
  override def right: Expression = weight

  private lazy val elementIsFloat = vec.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def prettyName: String = "vec_weighted_mean"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (vec.dataType, weight.dataType) match {
    case (ArrayType(FloatType, _) | ArrayType(DoubleType, _),
          _: org.apache.spark.sql.types.NumericType) => TypeCheckResult.TypeCheckSuccess
    case (v, w) => TypeCheckResult.TypeCheckFailure(
      s"vec_weighted_mean requires (array<float|double>, numeric), got (${v.simpleString}, ${w.simpleString})")
  }

  private def weightOf(w: Any): Double = w match {
    case d: java.lang.Double => d
    case f: java.lang.Float => f.toDouble
    case l: java.lang.Long => l.toDouble
    case i: java.lang.Integer => i.toDouble
    case s: java.lang.Short => s.toDouble
    case b: java.lang.Byte => b.toDouble
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case other => throw new IllegalArgumentException(
      s"vec_weighted_mean: unsupported weight $other")
  }

  override def createAggregationBuffer(): VectorWeightedMean.Buffer =
    new VectorWeightedMean.Buffer(0.0, null)

  override def update(buf: VectorWeightedMean.Buffer, input: InternalRow): VectorWeightedMean.Buffer = {
    val v = vec.eval(input)
    val w = weight.eval(input)
    if (v != null && w != null) {
      val wd = weightOf(w)
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (buf.sums == null) buf.sums = new Array[Double](n)
      else if (buf.sums.length != n) throw new IllegalArgumentException(
        s"vec_weighted_mean: ragged vector dimensions ${buf.sums.length} vs $n")
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val x = if (elementIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          buf.sums(i) += x * wd
        }
        i += 1
      }
      buf.wsum += wd
    }
    buf
  }

  override def merge(buf: VectorWeightedMean.Buffer, other: VectorWeightedMean.Buffer): VectorWeightedMean.Buffer = {
    if (other.sums != null) {
      if (buf.sums == null) { buf.sums = other.sums.clone(); buf.wsum = other.wsum }
      else {
        if (buf.sums.length != other.sums.length) throw new IllegalArgumentException(
          s"vec_weighted_mean: ragged vector dimensions ${buf.sums.length} vs ${other.sums.length}")
        var i = 0
        while (i < buf.sums.length) { buf.sums(i) += other.sums(i); i += 1 }
        buf.wsum += other.wsum
      }
    }
    buf
  }

  override def eval(buf: VectorWeightedMean.Buffer): Any =
    if (buf.sums == null || buf.wsum == 0.0) null
    else new GenericArrayData(buf.sums.map(_ / buf.wsum))

  override def serialize(buf: VectorWeightedMean.Buffer): Array[Byte] = {
    val dim = if (buf.sums == null) -1 else buf.sums.length
    val bb = ByteBuffer.allocate(8 + 4 + math.max(dim, 0) * 8)
    bb.putDouble(buf.wsum).putInt(dim)
    if (dim > 0) buf.sums.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorWeightedMean.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val wsum = bb.getDouble
    val dim = bb.getInt
    val sums = if (dim < 0) null else Array.fill(dim)(bb.getDouble)
    new VectorWeightedMean.Buffer(wsum, sums)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorWeightedMean =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorWeightedMean =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VectorWeightedMean =
    copy(vec = newLeft, weight = newRight)
}

object VectorWeightedMean {
  /** Mutable partial state: running weighted element sums + total weight. */
  final class Buffer(var wsum: Double, var sums: Array[Double])
}
