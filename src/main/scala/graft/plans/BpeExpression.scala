package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_encode` — apply a trained BPE merge list ([[graft.functions.Bpe]])
  * to a text column, yielding the subword token array. The merge rules
  * ride in the EXPRESSION (plan literal, serialized with the task
  * closure), so application is embarrassingly map-side: no join against
  * a rules table, no shuffle, and the whole corpus encodes in one scan.
  *
  * Standard rank-priority application per whitespace word: repeatedly
  * merge the present pair with the LOWEST merge rank until none remain
  * — NOT greedy-longest, so encode(train corpus) reproduces exactly the
  * symbol sequences training ended with. Characters never seen in
  * training remain single-character tokens (byte-fallback-style OOV).
  * Tokenization mirrors [[graft.functions.TextFunctions.tokens]]
  * (normalize + whitespace split) so train and apply agree.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "bpe_encode"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires a string column, got ${other.simpleString}")
  }

  @transient private lazy val coder = new BpeCoder(merges.toIndexedSeq)

  override def nullSafeEval(input: Any): Any =
    coder.encode(input.asInstanceOf[UTF8String])

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

/** The rank-priority merge loop shared by [[BpeEncode]] (plan-literal
  * rules) and [[BpeEncodeBroadcast]] (broadcast rules) — one coder per
  * expression instance, built lazily on the executor.
  */
private[plans] final class BpeCoder(merges: IndexedSeq[(String, String)]) {
  private val rank: Map[(String, String), Int] = merges.zipWithIndex.toMap

  private def encodeWord(word: String): Seq[String] = {
    var syms: Vector[String] = word.map(_.toString).toVector
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val (a, b) = merges(bestRank)
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            out += (a + b); j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
        done = syms.length < 2
      }
    }
    syms
  }

  def encode(input: UTF8String): GenericArrayData = {
    // mirror TextFunctions.normalize: lowercase, collapse whitespace, trim
    val text = input.toString.toLowerCase.replaceAll("\\s+", " ").trim
    val toks =
      if (text.isEmpty) Array.empty[String]
      else text.split(' ').flatMap(encodeWord)
    new GenericArrayData(toks.map(UTF8String.fromString(_)))
  }
}

/** [[BpeEncode]] with the merge rules in a BROADCAST instead of the plan:
  * a plan-literal rule list is re-serialized into every stage's task
  * binary and capped by plan/codegen size (a production 50k-merge
  * vocabulary is megabytes); a broadcast ships ONCE per executor via the
  * torrent protocol and is shared by every stage and query that holds
  * the handle. Semantics are identical to [[BpeEncode]] — spec-pinned.
  *
  * Carries a live [[Broadcast]] handle, so it cannot be built from SQL
  * text (no FunctionRegistry entry); use [[graft.functions.Bpe.encodeBroadcast]].
  */
case class BpeEncodeBroadcast(child: Expression,
    rules: org.apache.spark.broadcast.Broadcast[Array[(String, String)]])
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "bpe_encode_broadcast"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode_broadcast requires a string column, got ${other.simpleString}")
  }

  @transient private lazy val coder = new BpeCoder(rules.value.toIndexedSeq)

  override def nullSafeEval(input: Any): Any =
    coder.encode(input.asInstanceOf[UTF8String])

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeBroadcast =
    copy(child = newChild)
}
