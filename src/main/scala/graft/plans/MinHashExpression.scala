package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** MinHash signature slots in ONE pass over the shingle array, ONE md5
  * per shingle: h = (60-bit md5 prefix) mod p, then
  * slot j = min over shingles of (a_j·h + b_j) mod p — the standard
  * Carter–Wegman universal-hash permutation family (Broder '97 minhash).
  *
  * p = 2^31−1 (Mersenne) keeps every product a_j·h < 2^62 inside a signed
  * 64-bit long, so the identical arithmetic runs in the DuckDB oracle
  * with no 128-bit help. Earlier revisions digested k seeded md5s per
  * shingle; deriving the k permutations from one digest is ~k× less
  * digest work at unchanged collision behavior.
  *
  * The aggregate formulation explodes every shingle and shuffles
  * (doc, shingle) rows into a k-column hash aggregate; this expression
  * turns signature computation into a map-side projection — zero
  * shuffle — which at 100 TB removes the widest exchange in the dedup
  * pipeline.
  *
  * CodegenFallback is deliberate: one virtual eval per row, with the
  * n-md5 loop in plain JVM code (the digest dominates, not dispatch).
  */
case class MinHashSlots(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  import MinHashSlots._

  override def prettyName: String = "minhash_slots"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_slots requires array<string>, got ${other.simpleString}")
  }

  @transient private lazy val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  @transient private lazy val as: Array[Long] = (0 until numHashes).map(coeffA).toArray
  @transient private lazy val bs: Array[Long] = (0 until numHashes).map(coeffB).toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Prime) // sentinel > any slot value
    val md = digest.get()
    var i = 0
    while (i < n) {
      md.reset()
      md.update(arr.getUTF8String(i).getBytes)
      val out = md.digest()
      // first 15 hex chars = 60 bits: bytes 0..6 then the high nibble of
      // byte 7 — identical to ('0x' || substr(md5(sh),1,15))::BIGINT
      var h = 0L
      var k = 0
      while (k < 7) { h = (h << 8) | (out(k) & 0xffL); k += 1 }
      h = (h << 4) | ((out(7) >> 4) & 0xfL)
      val hm = h % Prime
      var j = 0
      while (j < numHashes) {
        val v = (as(j) * hm + bs(j)) % Prime
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSlots {
  /** 2^31 − 1 (Mersenne prime): the permutation modulus. */
  val Prime: Long = 2147483647L

  /** Deterministic Carter–Wegman coefficients from golden-ratio/murmur
    * mixing constants — pure arithmetic, identical in the SQL oracle
    * (SparkEntry inlines these values into the DuckDB query).
    */
  def coeffA(j: Int): Long = (0x9E3779B9L * (j + 1)) % (Prime - 1) + 1
  def coeffB(j: Int): Long = (0x85EBCA6BL * (j + 1)) % Prime
}

/** [[MinHashSlots]] with the SHINGLE BUILD fused in: takes the token
  * array and forms each word n-gram inside the JVM loop, instead of a
  * declarative `transform(sequence(...), concat_ws(...))` — a
  * higher-order function Spark evaluates INTERPRETED per element, plus a
  * materialized shingle array per row. Semantically identical to
  * shingling-then-[[MinHashSlots]]: duplicates need no array_distinct
  * because a minimum over a multiset equals the minimum over its set,
  * and the n-gram strings (space-joined) byte-match `concat_ws(" ", …)`,
  * so the DuckDB oracle arithmetic is unchanged. This halves the cost of
  * the signature stage that every MinHash dedup consumer shares.
  */
case class MinHashSlotsTokens(child: Expression, shingleN: Int, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  import MinHashSlots._

  override def prettyName: String = "minhash_slots_tokens"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_slots_tokens requires array<string>, got ${other.simpleString}")
  }

  @transient private lazy val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  @transient private lazy val as: Array[Long] = (0 until numHashes).map(coeffA).toArray
  @transient private lazy val bs: Array[Long] = (0 until numHashes).map(coeffB).toArray

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val mins = Array.fill(numHashes)(Prime)
    val md = digest.get()
    val sb = new java.lang.StringBuilder(64)
    def update(): Unit = {
      md.reset()
      md.update(sb.toString.getBytes("UTF-8"))
      val out = md.digest()
      var h = 0L
      var k = 0
      while (k < 7) { h = (h << 8) | (out(k) & 0xffL); k += 1 }
      h = (h << 4) | ((out(7) >> 4) & 0xfL)
      val hm = h % Prime
      var j = 0
      while (j < numHashes) {
        val v = (as(j) * hm + bs(j)) % Prime
        if (v < mins(j)) mins(j) = v
        j += 1
      }
    }
    if (n >= shingleN) {
      var i = 0
      while (i <= n - shingleN) {
        sb.setLength(0)
        var j = 0
        while (j < shingleN) {
          if (j > 0) sb.append(' ')
          sb.append(toks.getUTF8String(i + j).toString)
          j += 1
        }
        update()
        i += 1
      }
    } else {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks.getUTF8String(j).toString)
        j += 1
      }
      update()
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sorted DISTINCT 60-bit shingle hashes of a token array in ONE fused
  * pass — shingles form inside the loop (no per-row shingle array), one
  * md5 per shingle, sort + in-place dedupe at the end. Semantically
  * `sort_array(transform(array_distinct(shingles), hash60))` (identical
  * modulo 2⁻⁶⁰ hash collisions, where this collapses colliding strings
  * to one slot — the same identity the hash-keyed joins already assume),
  * but the HOF formulation evaluates INTERPRETED and re-runs wherever
  * projection collapse duplicates it; this kernel is the signature
  * builder of [[graft.operators.Dedup]]'s set-similarity family.
  * CodegenFallback like [[MinHashSlotsTokens]]: the md5 loop dominates,
  * not dispatch.
  */
case class SortedShingleHashes(child: Expression, shingleN: Int)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "sorted_shingle_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sorted_shingle_hashes requires array<string>, got ${other.simpleString}")
  }

  @transient private lazy val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val md = digest.get()
    val sb = new java.lang.StringBuilder(64)
    def h(): Long = {
      md.reset()
      md.update(sb.toString.getBytes("UTF-8"))
      val out = md.digest()
      var v = 0L
      var k = 0
      while (k < 7) { v = (v << 8) | (out(k) & 0xffL); k += 1 }
      (v << 4) | ((out(7) >> 4) & 0xfL)
    }
    val count = if (n >= shingleN) n - shingleN + 1 else 1
    val hs = new Array[Long](count)
    if (n >= shingleN) {
      var i = 0
      while (i <= n - shingleN) {
        sb.setLength(0)
        var j = 0
        while (j < shingleN) {
          if (j > 0) sb.append(' ')
          sb.append(toks.getUTF8String(i + j).toString)
          j += 1
        }
        hs(i) = h()
        i += 1
      }
    } else {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks.getUTF8String(j).toString)
        j += 1
      }
      hs(0) = h()
    }
    java.util.Arrays.sort(hs)
    // in-place dedupe of the sorted run
    var w = 0
    var r = 0
    while (r < count) {
      if (w == 0 || hs(r) != hs(w - 1)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    new GenericArrayData(if (w == count) hs else java.util.Arrays.copyOf(hs, w))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
