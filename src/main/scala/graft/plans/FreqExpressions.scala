package graft.plans

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MERGEABLE HEAVY-HITTERS sketches (DataSketches frequent-items — the
  * Misra-Gries/SpaceSaving family) — the frequency member of the sketch
  * trio next to the HLL distinct-count rollup
  * ([[graft.operators.Analytics.sketchRollup]]) and the KLL quantile
  * rollup ([[KllSketchAgg]]): one sketch row per bucket, re-aggregable
  * to any bucket combination without rescanning raw data, answering
  * "what are the most frequent items and how frequent" with bounded
  * over-estimation error (≤ n/maxMapSize·3.5 by the published bound).
  *
  * `freq_sketch_agg(item, maxMapSize)` aggregates strings into a
  * serialized sketch (maxMapSize: power of two; while distinct items
  * stay under its load factor the counts are EXACT — the oracle-able
  * regime); `freq_merge_agg(sketch)` unions serialized sketches;
  * `freq_topk(sketch, k)` reads the top k as
  * `array<struct<item, estimate, lower_bound, upper_bound>>`, ordered
  * (estimate DESC, item ASC) so ties are deterministic. All
  * CodegenFallback — the hash-map update dominates dispatch. Sketch
  * bytes are engine-specific ⇒ the binary itself is spec-tested; the
  * exact regime is oracle-keyed (q_heavy_hitters).
  */
case class FreqSketchAgg(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] with UnaryLike[Expression] {

  require(maxMapSize >= 8 && (maxMapSize & (maxMapSize - 1)) == 0,
    s"freq_sketch_agg maxMapSize must be a power of two >= 8, got $maxMapSize")

  override def prettyName: String = "freq_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"freq_sketch_agg requires a string column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: ItemsSketch[String], other: ItemsSketch[String]): ItemsSketch[String] = {
    buf.merge(other)
    buf
  }

  override def eval(buf: ItemsSketch[String]): Any =
    if (buf.isEmpty) null else buf.toByteArray(FreqSketch.serde)

  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    buf.toByteArray(FreqSketch.serde)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), FreqSketch.serde)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqSketchAgg =
    copy(child = newChild)
}

object FreqSketch {
  val serde = new ArrayOfStringsSerDe
}

/** Union of serialized frequent-items sketches — the bucket-combining
  * aggregate of the rollup pattern. Adopts the FIRST input sketch so the
  * caller's chosen capacity survives (merging into a smaller default
  * accumulator would widen every error bound — same adoption rule as
  * [[KllMergeAgg]]).
  */
case class FreqMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] with UnaryLike[Expression] {

  override def prettyName: String = "freq_merge_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"freq_merge_agg requires a binary sketch column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](8)

  override def update(buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val in = ItemsSketch.getInstance(
        Memory.wrap(v.asInstanceOf[Array[Byte]]), FreqSketch.serde)
      if (buf.isEmpty) in else { buf.merge(in); buf }
    }
  }

  override def merge(buf: ItemsSketch[String], other: ItemsSketch[String]): ItemsSketch[String] =
    if (other.isEmpty) buf
    else if (buf.isEmpty) other
    else { buf.merge(other); buf }

  override def eval(buf: ItemsSketch[String]): Any =
    if (buf.isEmpty) null else buf.toByteArray(FreqSketch.serde)

  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    buf.toByteArray(FreqSketch.serde)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), FreqSketch.serde)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqMergeAgg =
    copy(child = newChild)
}

/** `freq_topk(sketch, k)` — the top-k heavy hitters of a serialized
  * frequent-items sketch as `array<struct<item, estimate, lower_bound,
  * upper_bound>>`, ordered (estimate DESC, item ASC). Uses
  * NO_FALSE_NEGATIVES candidates, so a truly frequent item is never
  * dropped by thresholding before the k cap. Null for null sketches.
  */
case class FreqTopK(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "freq_topk"

  private val struct = StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("estimate", LongType, nullable = false),
    StructField("lower_bound", LongType, nullable = false),
    StructField("upper_bound", LongType, nullable = false)))
  override def dataType: DataType = ArrayType(struct, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"freq_topk requires (binary, int), got (${l.simpleString}, ${r.simpleString})")
  }

  override def nullSafeEval(sketchBytes: Any, kAny: Any): Any = {
    val k = kAny.asInstanceOf[Int]
    val sketch = ItemsSketch.getInstance(
      Memory.wrap(sketchBytes.asInstanceOf[Array[Byte]]), FreqSketch.serde)
    val rows = sketch.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .sortBy(r => (-r.getEstimate, r.getItem))
      .take(k)
      .map { r =>
        InternalRow(UTF8String.fromString(r.getItem), r.getEstimate,
          r.getLowerBound, r.getUpperBound)
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): FreqTopK =
    copy(left = newLeft, right = newRight)
}
