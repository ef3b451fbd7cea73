package graft.plans

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, NumericType}

/** MERGEABLE QUANTILE sketches (DataSketches KLL, Karnin-Lang-Liberty
  * FOCS'16) — the quantile twin of the HLL distinct-count sketch table
  * ([[graft.operators.Analytics.sketchRollup]]): one sketch row per
  * bucket, re-aggregable to any bucket combination with bounded rank
  * error and WITHOUT rescanning raw data. Spark ships the DataSketches
  * jar for its hll_* builtins but exposes no quantile-sketch aggregate;
  * these expressions close that gap.
  *
  * `kll_sketch_agg(value, k)` aggregates raw doubles into a serialized
  * sketch; `kll_merge_agg(sketch)` unions serialized sketches;
  * `kll_quantile(sketch, q)` reads one quantile out. All
  * CodegenFallback — the sketch update dominates dispatch. Sketches are
  * engine-specific binary ⇒ spec-tested, not oracle-keyed (same policy
  * as the HLL rollup).
  */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def prettyName: String = "kll_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_sketch_agg requires a numeric column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Number].doubleValue())
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any =
    if (buf.isEmpty) null else buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** Union of serialized KLL sketches — the bucket-combining aggregate of
  * the rollup pattern. Input rows are `kll_sketch_agg` outputs.
  */
case class KllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def prettyName: String = "kll_merge_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_merge_agg requires a binary sketch column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(
      org.apache.datasketches.kll.KllSketch.DEFAULT_K)

  // KLL merge degrades to the SMALLER k of the two sides, so merging
  // into the default-k accumulator would floor a caller's higher-k
  // sketches — ADOPT the first sketch (update/merge return the buffer
  // to use from here on) and only then merge further inputs into it
  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val in = KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]]))
      if (buf.isEmpty) in else { buf.merge(in); buf }
    }
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch =
    if (other.isEmpty) buf
    else if (buf.isEmpty) other
    else { buf.merge(other); buf }

  override def eval(buf: KllDoublesSketch): Any =
    if (buf.isEmpty) null else buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
}

/** `kll_quantile(sketch, q)` — the inclusive quantile at rank q of a
  * serialized KLL sketch; null for null/empty sketches.
  */
case class KllQuantile(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "kll_quantile"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"kll_quantile requires (binary, double), got (${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(sketchBytes: Any, q: Any): Any = {
    val sketch = KllDoublesSketch.heapify(
      Memory.wrap(sketchBytes.asInstanceOf[Array[Byte]]))
    if (sketch.isEmpty) null
    else sketch.getQuantile(q.asInstanceOf[Double], QuantileSearchCriteria.INCLUSIVE)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
}
