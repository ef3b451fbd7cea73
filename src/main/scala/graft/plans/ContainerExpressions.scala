package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** A deterministic binary message-container codec — the sandbox stand-in
  * for the reference's ROS bag container (service/app/main.py:87
  * `bagreader` + `message_by_topic` splits an opaque container into
  * per-topic message tables). The bag codec itself is not public
  * infrastructure we can ship, so the container FORMAT here is a plain
  * length-prefixed record stream; what is real and tested is the Spark
  * plumbing a binary-container source needs: opaque `binary` columns,
  * a parse expression yielding `array<struct>`, explode to per-topic
  * rows, provenance stamping, partitioned write.
  *
  * Record layout (big-endian):
  *   [u32 topic_len][topic utf8][i64 ts_us][u32 payload_len][payload]
  */
object ContainerCodec {
  val MessageType: StructType = StructType(Seq(
    StructField("topic", StringType),
    StructField("ts_us", LongType),
    StructField("payload", BinaryType)))
}

/** array<struct<topic,ts_us,payload>> → one container binary. */
case class ContainerPack(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "container_pack"
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(fields), _)
        if fields.length == 3 &&
          fields(0).dataType == StringType &&
          fields(1).dataType == LongType &&
          fields(2).dataType == BinaryType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"container_pack requires array<struct<topic:string,ts_us:bigint,payload:binary>>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val msgs = input.asInstanceOf[ArrayData]
    val n = msgs.numElements()
    var size = 0
    val topics = new Array[Array[Byte]](n)
    val payloads = new Array[Array[Byte]](n)
    val tss = new Array[Long](n)
    var i = 0
    while (i < n) {
      val m = msgs.getStruct(i, 3)
      if (m == null || m.isNullAt(0) || m.isNullAt(1) || m.isNullAt(2))
        throw new IllegalArgumentException(
          s"container_pack: message $i has a null struct or null " +
            "topic/ts_us/payload — the container format has no null encoding")
      topics(i) = m.getUTF8String(0).getBytes
      tss(i) = m.getLong(1)
      payloads(i) = m.getBinary(2)
      size += 4 + topics(i).length + 8 + 4 + payloads(i).length
      i += 1
    }
    val buf = ByteBuffer.allocate(size)
    i = 0
    while (i < n) {
      buf.putInt(topics(i).length).put(topics(i))
        .putLong(tss(i))
        .putInt(payloads(i).length).put(payloads(i))
      i += 1
    }
    buf.array()
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** container binary → array<struct<topic,ts_us,payload>> (inverse of
  * [[ContainerPack]]; throws on a malformed/truncated container).
  */
case class ContainerUnpack(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "container_unpack"
  override def dataType: DataType = ArrayType(ContainerCodec.MessageType)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"container_unpack requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val buf = ByteBuffer.wrap(input.asInstanceOf[Array[Byte]])
    val out = new java.util.ArrayList[InternalRow]()
    while (buf.remaining() > 0) {
      val tlen = buf.getInt
      val tb = new Array[Byte](tlen); buf.get(tb)
      val ts = buf.getLong
      val plen = buf.getInt
      val pb = new Array[Byte](plen); buf.get(pb)
      out.add(new GenericInternalRow(Array[Any](
        UTF8String.fromBytes(tb), ts, pb)))
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
