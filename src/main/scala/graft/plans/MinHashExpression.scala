package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature slots in ONE pass over the shingle array:
  * slot j = min over shingles of md5("j|" ++ shingle), as lowercase hex —
  * byte-identical to `min(md5(concat(lit("j|"), sh)))`, which is what the
  * SQL oracle computes.
  *
  * The aggregate formulation explodes every shingle and shuffles
  * (doc, shingle) rows into a k-column hash aggregate; this expression
  * turns signature computation into a map-side projection — zero
  * shuffle — which at 100 TB removes the widest exchange in the dedup
  * pipeline. md5 work is identical; only the movement disappears.
  *
  * CodegenFallback is deliberate: one virtual eval per row, with the
  * k·n md5 loop in plain JVM code (the digest dominates, not dispatch).
  */
case class MinHashSlots(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "minhash_slots"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_slots requires array<string>, got ${other.simpleString}")
  }

  @transient private lazy val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val hexChars = "0123456789abcdef".toCharArray

  private def md5Hex(prefix: Array[Byte], payload: Array[Byte]): String = {
    val md = digest.get()
    md.reset()
    md.update(prefix)
    md.update(payload)
    val out = md.digest()
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < out.length) {
      sb.append(hexChars((out(i) >> 4) & 0xf))
      sb.append(hexChars(out(i) & 0xf))
      i += 1
    }
    sb.toString
  }

  @transient private lazy val prefixes: Array[Array[Byte]] =
    (0 until numHashes).map(j => s"$j|".getBytes("UTF-8")).toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = new Array[String](numHashes)
    var i = 0
    while (i < n) {
      val sh = arr.getUTF8String(i).getBytes
      var j = 0
      while (j < numHashes) {
        val h = md5Hex(prefixes(j), sh)
        if (mins(j) == null || h.compareTo(mins(j)) < 0) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(m => UTF8String.fromString(if (m == null) "" else m)))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
