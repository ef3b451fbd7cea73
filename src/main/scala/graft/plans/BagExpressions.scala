package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

import net.jpountz.lz4.{LZ4FrameInputStream, LZ4FrameOutputStream}
import org.apache.commons.compress.compressors.bzip2.{BZip2CompressorInputStream, BZip2CompressorOutputStream}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ROS bag v2.0 codec — reader + conformant writer for the PUBLIC bag
  * format (wiki.ros.org/Bags/Format/2.0), closing the reference's real
  * ingestion gap: service/app/main.py:87 `bagreader(local_file)` /
  * main.py:94 `bag.message_by_topic(topic)` operate on actual `.bag`
  * files, where [[ContainerCodec]] is the sandbox stand-in format.
  *
  * Format (all integers little-endian):
  * {{{
  *   #ROSBAG V2.0\n                                 version line
  *   <u32 header_len><header><u32 data_len><data>   record, repeated
  *   header := (<u32 field_len><name>=<value>)*
  * }}}
  * Record kinds by the `op` header field: 0x03 bag header (padded to
  * 4096 bytes), 0x05 chunk (compression `none`/`bz2`/`lz4`; data = embedded
  * connection + message records), 0x07 connection (data = a second
  * header block with topic/type/md5sum/message_definition), 0x02
  * message data (conn + time; data = serialized message), 0x04 index
  * data and 0x06 chunk info (read-skipped; written for conformance).
  *
  * The reader walks top-level records, learns conn→topic from
  * connection records (top-level or in-chunk), inflates chunks per
  * their `compression` field, and emits message rows in encounter
  * order. Index records are advisory — a partially-written bag still
  * reads (rosbag's own reindex contract). The writer emits the standard
  * layout: bag header, one chunk holding every connection + message,
  * per-connection index data, duplicated connection records at
  * `index_pos`, one chunk info record.
  *
  * Scale shape: one bag = one `binaryFile` row = one task; parse is
  * map-side with no shuffle (see [[graft.sources.Containers.readBagFiles]]).
  * ROS `time` is (u32 secs, u32 nsecs); `ts_us` maps exactly —
  * secs = ts/1e6, nsecs = (ts%1e6)*1000 — so pack∘unpack is lossless
  * at the engine's µs event-time grain.
  */
object BagCodec {
  private val Magic = "#ROSBAG V2.0\n".getBytes(UTF_8)

  /** The version line, for [[BagPlanner]] and source-side sniffing. */
  def magicBytes: Array[Byte] = Magic

  private val OpMessageData = 0x02.toByte
  private val OpBagHeader = 0x03.toByte
  private val OpIndexData = 0x04.toByte
  private val OpChunk = 0x05.toByte
  private val OpChunkInfo = 0x06.toByte
  private val OpConnection = 0x07.toByte

  /** Fixed message type for packed bags: payloads are opaque bytes (the
    * engine's decode stage is downstream — same contract as the
    * container codec). Public md5/def strings, deterministic output.
    */
  private val MsgType = "graft_msgs/Blob"
  private val MsgDef = "uint8[] data\n"

  // ------------------------------------------------------------ encoding

  private def le32(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()
  private def le64(v: Long): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v).array()
  private def timeBytes(tsUs: Long): Array[Byte] = {
    // The wire time is (uint32 secs, uint32 nsecs): seconds past 2^32
    // (~year 2106) cannot be represented, and a silent .toInt wrap would
    // break pack∘unpack identity — fail as loudly as negative times do.
    val secsL = tsUs / 1000000L
    require(secsL <= 0xFFFFFFFFL,
      s"bag time seconds exceed uint32 (ts_us=$tsUs): not representable")
    val secs = secsL.toInt
    val nsecs = ((tsUs % 1000000L) * 1000L).toInt
    le32(secs) ++ le32(nsecs)
  }

  private def field(name: String, value: Array[Byte]): Array[Byte] = {
    val nb = name.getBytes(UTF_8)
    le32(nb.length + 1 + value.length) ++ nb ++ Array('='.toByte) ++ value
  }

  private def header(fields: (String, Array[Byte])*): Array[Byte] =
    fields.toArray.flatMap { case (n, v) => field(n, v) }

  private def record(out: ByteArrayOutputStream, h: Array[Byte],
                     data: Array[Byte]): Unit = {
    out.write(le32(h.length)); out.write(h)
    out.write(le32(data.length)); out.write(data)
  }

  private def connectionRecord(conn: Int, topic: String,
      msgType: String, msgDef: String): (Array[Byte], Array[Byte]) = {
    // the REAL genmsg md5 (normalized text, nested types replaced by
    // their md5) — a ROS stack reading this bag agrees on the hash
    val md5 = RosMsg.md5sum(msgDef)
    val h = header("op" -> Array(OpConnection), "conn" -> le32(conn),
      "topic" -> topic.getBytes(UTF_8))
    val data = header("topic" -> topic.getBytes(UTF_8),
      "type" -> msgType.getBytes(UTF_8),
      "md5sum" -> md5.getBytes(UTF_8),
      "message_definition" -> msgDef.getBytes(UTF_8))
    (h, data)
  }

  /** Serialize messages (already in the caller's intended order) into a
    * conformant v2.0 bag. `compression` ∈ {none, bz2, lz4} applies per
    * chunk (lz4 = the LZ4 frame format, what roslz4 streams);
    * `messagesPerChunk` splits the stream into multiple chunks (rosbag
    * writes ~768 KiB chunks the same way) — the unit
    * [[graft.sources.v2.BagDataSource]] parallelizes over. Every chunk
    * carries the full connection set (duplicate connection records are
    * legal and keep each chunk self-describing).
    */
  def pack(msgs: Seq[(String, Long, Array[Byte])], compression: String,
           messagesPerChunk: Int = Int.MaxValue,
           typeInfo: Option[(String, String)] = None): Array[Byte] = {
    val (msgType, msgDef) = typeInfo.getOrElse((MsgType, MsgDef))
    require(compression == "none" || compression == "bz2" ||
        compression == "lz4",
      s"bag compression must be none|bz2|lz4, got '$compression'")
    require(messagesPerChunk >= 1, s"messagesPerChunk must be >= 1")
    val out = new ByteArrayOutputStream()
    out.write(Magic)

    val topics = msgs.map(_._1).distinct
    val connOf = topics.zipWithIndex.toMap
    val chunks: Seq[Seq[(String, Long, Array[Byte])]] =
      if (msgs.isEmpty) Nil else msgs.grouped(messagesPerChunk).toSeq

    val bagHeaderFields = (indexPos: Long) => header("op" -> Array(OpBagHeader),
      "index_pos" -> le64(indexPos), "conn_count" -> le32(topics.size),
      "chunk_count" -> le32(chunks.size))
    // bag header record is padded to 4096 bytes with 0x20 in data
    val padLen = 4096 - 8 - bagHeaderFields(0L).length
    require(padLen >= 0, "bag header overflow")

    // chunk section: per chunk, the chunk record then its per-connection
    // index-data records (message offsets inside the UNCOMPRESSED data)
    val chunkSection = new ByteArrayOutputStream()
    val chunkInfos = chunks.map { chunkMsgs =>
      val chunkPos = Magic.length.toLong + 4096 + chunkSection.size()
      val inner = new ByteArrayOutputStream()
      topics.foreach { t =>
        val (h, d) = connectionRecord(connOf(t), t, msgType, msgDef)
        record(inner, h, d)
      }
      val offsets = chunkMsgs.map { case (topic, tsUs, payload) =>
        require(tsUs >= 0, s"bag time is unsigned, got ts_us=$tsUs")
        val off = inner.size()
        record(inner,
          header("op" -> Array(OpMessageData), "conn" -> le32(connOf(topic)),
            "time" -> timeBytes(tsUs)),
          payload)
        off
      }
      val innerBytes = inner.toByteArray
      val chunkData = compression match {
        case "none" => innerBytes
        case "bz2" =>
          val bz = new ByteArrayOutputStream()
          val z = new BZip2CompressorOutputStream(bz)
          z.write(innerBytes); z.close()
          bz.toByteArray
        case _ => // lz4: the LZ4 frame format roslz4 streams (lz4s.c)
          val lz = new ByteArrayOutputStream()
          // 64 KiB frame blocks: the default 4 MiB block allocates
          // compressed+uncompressed buffers PER STREAM — ruinous churn
          // when packing many small per-group bags (measured 4.1→6.1 s
          // on the roundtrip bench); roslz4 itself streams 64 KiB blocks
          val z = new LZ4FrameOutputStream(lz,
            LZ4FrameOutputStream.BLOCKSIZE.SIZE_64KB)
          z.write(innerBytes); z.close()
          lz.toByteArray
      }
      record(chunkSection,
        header("op" -> Array(OpChunk),
          "compression" -> compression.getBytes(UTF_8),
          "size" -> le32(innerBytes.length)),
        chunkData)
      topics.foreach { t =>
        val conn = connOf(t)
        val mine = chunkMsgs.zip(offsets).filter(_._1._1 == t)
        if (mine.nonEmpty) {
          val data = new ByteArrayOutputStream()
          mine.foreach { case ((_, tsUs, _), off) =>
            data.write(timeBytes(tsUs)); data.write(le32(off))
          }
          record(chunkSection,
            header("op" -> Array(OpIndexData), "ver" -> le32(1),
              "conn" -> le32(conn), "count" -> le32(mine.size)),
            data.toByteArray)
        }
      }
      (chunkPos, chunkMsgs)
    }
    val indexPos = Magic.length.toLong + 4096 + chunkSection.size()

    // assemble: bag header (padded) | chunk section | connections |
    // one chunk-info record per chunk
    record(out, bagHeaderFields(indexPos), Array.fill(padLen)(' '.toByte))
    out.write(chunkSection.toByteArray)
    topics.foreach { t =>
      val (h, d) = connectionRecord(connOf(t), t, msgType, msgDef)
      record(out, h, d)
    }
    chunkInfos.foreach { case (chunkPos, chunkMsgs) =>
      val ts = chunkMsgs.map(_._2)
      val present = topics.filter(t => chunkMsgs.exists(_._1 == t))
      val ciData = new ByteArrayOutputStream()
      present.foreach { t =>
        ciData.write(le32(connOf(t)))
        ciData.write(le32(chunkMsgs.count(_._1 == t)))
      }
      record(out,
        header("op" -> Array(OpChunkInfo), "ver" -> le32(1),
          "chunk_pos" -> le64(chunkPos),
          "start_time" -> timeBytes(ts.min),
          "end_time" -> timeBytes(ts.max),
          "count" -> le32(present.size)),
        ciData.toByteArray)
    }
    out.toByteArray
  }

  // ------------------------------------------------------------ decoding

  private final class Cursor(val bytes: Array[Byte], var pos: Int) {
    def remaining: Int = bytes.length - pos
    def u32(): Int = {
      val v = ByteBuffer.wrap(bytes, pos, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
      pos += 4; v
    }
    def take(n: Int): Array[Byte] = {
      require(n >= 0 && n <= remaining, s"bag truncated at $pos (need $n)")
      val a = java.util.Arrays.copyOfRange(bytes, pos, pos + n); pos += n; a
    }
  }

  /** Parse one header block's `<len><name>=<value>` fields (also the
    * encoding of a connection record's data block). */
  private[graft] def parseHeaderBytes(h: Array[Byte]): Map[String, Array[Byte]] =
    parseHeader(h)

  private def parseHeader(h: Array[Byte]): Map[String, Array[Byte]] = {
    val c = new Cursor(h, 0)
    val m = Map.newBuilder[String, Array[Byte]]
    while (c.remaining > 0) {
      val len = c.u32()
      val fb = c.take(len)
      val eq = fb.indexOf('='.toByte)
      require(eq > 0, "bag header field without '='")
      m += new String(fb, 0, eq, UTF_8) ->
        java.util.Arrays.copyOfRange(fb, eq + 1, fb.length)
    }
    m.result()
  }

  private def leInt(b: Array[Byte]): Int =
    ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt
  private[graft] def timeUs(b: Array[Byte]): Long = {
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val secs = bb.getInt.toLong & 0xFFFFFFFFL
    val nsecs = bb.getInt.toLong & 0xFFFFFFFFL
    secs * 1000000L + nsecs / 1000L
  }

  /** Decode every message of a v2.0 bag: (topic, ts_us, payload) in
    * encounter order. Handles `none`, `bz2` and `lz4` chunks plus unchunked
    * top-level message records; index/chunk-info records are skipped.
    */
  def unpack(bytes: Array[Byte]): Seq[(String, Long, Array[Byte])] = {
    require(bytes.length >= Magic.length &&
        java.util.Arrays.equals(java.util.Arrays.copyOf(bytes, Magic.length), Magic),
      "not a ROS bag v2.0 (bad magic)")
    unpackRecords(bytes, Magic.length, Map.empty)
  }

  /** Walk a raw record stream (no version line): the executor-side entry
    * for [[graft.sources.v2.BagDataSource]], which hands one chunk
    * record (or one top-level span) plus the connection map planning
    * collected; in-stream connection records extend it.
    */
  /** Fully read a decompression stream (closing it), pre-sizing the
    * buffer from the chunk header's declared uncompressed `size`. */
  private def drain(in: java.io.InputStream, sizeHint: Int): Array[Byte] = {
    try {
      val buf = new ByteArrayOutputStream(sizeHint.max(64))
      val tmp = new Array[Byte](65536)
      var n = in.read(tmp)
      while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
      buf.toByteArray
    } finally in.close()
  }

  def unpackRecords(bytes: Array[Byte], start: Int,
                    initialConns: Map[Int, String]): Seq[(String, Long, Array[Byte])] = {
    val conns = scala.collection.mutable.Map.empty[Int, String]
    conns ++= initialConns
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Array[Byte])]
    def walk(c: Cursor): Unit = while (c.remaining > 0) {
      val h = parseHeader(c.take(c.u32()))
      val data = c.take(c.u32())
      h("op")(0) match {
        case OpConnection =>
          val inner = parseHeader(data)
          val topic = inner.get("topic").orElse(h.get("topic"))
            .map(new String(_, UTF_8))
            .getOrElse(throw new IllegalArgumentException("connection without topic"))
          conns(leInt(h("conn"))) = topic
        case OpMessageData =>
          val conn = leInt(h("conn"))
          val topic = conns.getOrElse(conn,
            throw new IllegalArgumentException(s"message for unknown conn $conn"))
          out += ((topic, timeUs(h("time")), data))
        case OpChunk =>
          val compression = new String(h("compression"), UTF_8)
          val inner = compression match {
            case "none" => data
            case "bz2" =>
              drain(new BZip2CompressorInputStream(
                new ByteArrayInputStream(data)), leInt(h("size")))
            case "lz4" =>
              drain(new LZ4FrameInputStream(
                new ByteArrayInputStream(data)), leInt(h("size")))
            case other => throw new IllegalArgumentException(
              s"unsupported bag chunk compression: $other (none|bz2|lz4)")
          }
          walk(new Cursor(inner, 0))
        case OpBagHeader | OpIndexData | OpChunkInfo => // advisory — skip
        case _ => // forward-compatible: unknown op kinds are skipped
      }
    }
    walk(new Cursor(bytes, start))
    out.toSeq
  }
}

object BagPlanner {
  /** One connection's self-description, as embedded in the bag
    * (the typed-decode handle: `message_definition` drives
    * [[RosDeserialize]], matching bagpy's message_by_topic).
    */
  final case class ConnInfo(topic: String, msgType: String,
                            md5sum: String, messageDefinition: String)

  /** The driver-side plan of one bag: the connection map (conn → topic)
    * and the byte offsets work can split on — one entry per chunk
    * record, plus raw top-level spans for unchunked/index-less bags.
    * `connInfo` carries each connection's full self-description.
    * `chunkTimes` maps a chunk offset to its [start_time, end_time] in
    * µs as recorded by the chunk-info index records — rosbag's own
    * time index, which is what lets a time-banded scan drop chunks at
    * PLANNING (a chunk absent from the map has no known range and is
    * never pruned).
    * `chunkCounts` maps a chunk offset to its per-connection message
    * counts from the same chunk-info records — `rosbag info`'s message
    * tally, and what lets `count(*)` / `GROUP BY topic` queries answer
    * from the index alone without touching chunk data (a chunk absent
    * from the map has unknown counts and disables that fast path).
    */
  final case class BagPlan(conns: Map[Int, String], chunkOffsets: Seq[Long],
                          rawSpans: Seq[(Long, Long)],
                          connInfo: Map[Int, ConnInfo] = Map.empty,
                          chunkTimes: Map[Long, (Long, Long)] = Map.empty,
                          chunkCounts: Map[Long, Map[Int, Long]] = Map.empty)

  private def le32(b: Array[Byte]): Int =
    ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt
  private def le64(b: Array[Byte]): Long =
    ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getLong

  /** Plan a bag through positioned reads (`readAt(offset, len)` — a
    * Hadoop `FSDataInputStream.readFully` in production): O(record
    * HEADERS), never chunk data. With a healthy index the walk starts at
    * `index_pos` and touches only the index section (connection +
    * chunk-info records — exactly how `rosbag info` is O(index)); a
    * zero/corrupt `index_pos` falls back to a header-skip walk of the
    * whole record stream, collecting chunk offsets, connections, and
    * raw top-level message spans (the crashed-writer shape).
    */
  def plan(readAt: (Long, Int) => Array[Byte], fileLen: Long): BagPlan = {
    val magicLen = BagCodec.magicBytes.length
    require(fileLen >= magicLen + 8 &&
        java.util.Arrays.equals(readAt(0L, magicLen), BagCodec.magicBytes),
      "not a ROS bag v2.0 (bad magic)")

    def headerAt(off: Long): (Map[String, Array[Byte]], Int, Long) = {
      // returns (fields, dataLen, offset past the whole record)
      val hlen = le32(readAt(off, 4))
      val fields = BagCodec.parseHeaderBytes(readAt(off + 4, hlen))
      val dlen = le32(readAt(off + 4 + hlen, 4))
      (fields, dlen, off + 8L + hlen + dlen)
    }

    val (bagFields, _, afterBagHeader) = headerAt(magicLen.toLong)
    require(bagFields.get("op").exists(_.headOption.contains(0x03.toByte)),
      "first record is not a bag header")
    val indexPos = bagFields.get("index_pos").map(le64).getOrElse(0L)

    def walk(from: Long, indexOnly: Boolean): BagPlan = {
      val conns = Map.newBuilder[Int, String]
      val connInfos = Map.newBuilder[Int, ConnInfo]
      val chunkOffsets = Seq.newBuilder[Long]
      val rawSpans = Seq.newBuilder[(Long, Long)]
      val chunkTimes = Map.newBuilder[Long, (Long, Long)]
      val chunkCounts = Map.newBuilder[Long, Map[Int, Long]]
      var spanStart = -1L
      var off = from
      while (off < fileLen) {
        val (fields, dlen, next) = headerAt(off)
        val op = fields.get("op").flatMap(_.headOption).getOrElse(0.toByte)
        op match {
          case 0x07 => // connection: data block carries the topic + msg IDL
            val data = BagCodec.parseHeaderBytes(readAt(next - dlen, dlen))
            def str(k: String) = data.get(k).map(new String(_, UTF_8))
            data.get("topic").orElse(fields.get("topic"))
              .map(new String(_, UTF_8))
              .foreach { t =>
                val c = le32(fields("conn"))
                conns += c -> t
                connInfos += c -> ConnInfo(t,
                  str("type").getOrElse(""), str("md5sum").getOrElse(""),
                  str("message_definition").getOrElse(""))
              }
          case 0x05 if !indexOnly =>
            if (spanStart >= 0) { rawSpans += ((spanStart, off - spanStart)); spanStart = -1 }
            chunkOffsets += off
          case 0x06 => // chunk info: chunk_pos locates the chunk record
            val pos = le64(fields("chunk_pos"))
            chunkOffsets += pos
            for (s <- fields.get("start_time"); e <- fields.get("end_time"))
              chunkTimes += pos -> (BagCodec.timeUs(s), BagCodec.timeUs(e))
            // data payload: `count` (conn uint32, msg-count uint32)
            // pairs — still O(index), 8 bytes per (chunk, connection).
            // A malformed payload just leaves the chunk out of
            // chunkCounts (count pushdown then declines; never lies).
            val nConns = fields.get("count").map(le32).getOrElse(-1)
            if (nConns >= 0 && dlen == 8L * nConns) {
              val data = readAt(next - dlen, dlen)
              val m = Map.newBuilder[Int, Long]
              var i = 0
              while (i < nConns) {
                val c = le32(java.util.Arrays.copyOfRange(data, i * 8, i * 8 + 4))
                val n = le32(java.util.Arrays.copyOfRange(data, i * 8 + 4, i * 8 + 8))
                m += c -> (n.toLong & 0xFFFFFFFFL)
                i += 1
              }
              chunkCounts += pos -> m.result()
            }
          case 0x02 if !indexOnly =>
            if (spanStart < 0) spanStart = off
          case _ =>
            if (spanStart >= 0 && !indexOnly) {
              rawSpans += ((spanStart, off - spanStart)); spanStart = -1
            }
        }
        off = next
      }
      if (spanStart >= 0) rawSpans += ((spanStart, fileLen - spanStart))
      BagPlan(conns.result(), chunkOffsets.result().distinct.sorted,
        rawSpans.result(), connInfos.result(), chunkTimes.result(),
        chunkCounts.result())
    }

    if (indexPos >= afterBagHeader && indexPos < fileLen)
      walk(indexPos, indexOnly = true)
    else walk(afterBagHeader, indexOnly = false)
  }

  /** Per-connection time stats from the INDEX-DATA records (op=0x04,
    * ver=1) that trail each chunk record — rosbag's per-connection
    * message index ((time, offset) pairs into the uncompressed chunk).
    * For each chunk offset: skip the chunk record by its declared
    * lengths (its DATA is never read or decompressed), then parse the
    * trailing 0x04 records until a non-index op appears. Returns, per
    * chunk offset, per connection: (minTsUs, maxTsUs, entryCount).
    *
    * Cost is O(chunks × connections-per-chunk) header-sized positioned
    * reads — strictly more than the chunk-info walk of [[plan]] but
    * still zero chunk decompression, which is why
    * [[graft.sources.v2.BagAggPushdown]] pays it ONLY when a
    * topic-restricted min/max(ts_us) actually needs per-topic times
    * (chunk-info [start,end] spans ALL topics of a chunk and cannot
    * answer those exactly). A chunk whose index records are absent or
    * malformed is simply left out of the map — callers cross-check
    * entry counts against chunk-info's per-connection counts and
    * decline the fast path rather than guess (prune/pushdown may only
    * skip work, never lie).
    */
  def connTimes(readAt: (Long, Int) => Array[Byte], fileLen: Long,
                chunkOffsets: Seq[Long]): Map[Long, Map[Int, (Long, Long, Long)]] = {
    def headerAt(off: Long): (Map[String, Array[Byte]], Int, Long) = {
      val hlen = le32(readAt(off, 4))
      val fields = BagCodec.parseHeaderBytes(readAt(off + 4, hlen))
      val dlen = le32(readAt(off + 4 + hlen, 4))
      (fields, dlen, off + 8L + hlen + dlen)
    }
    val out = Map.newBuilder[Long, Map[Int, (Long, Long, Long)]]
    chunkOffsets.foreach { chunkOff =>
      try {
        val (cf, _, chunkEnd) = headerAt(chunkOff)
        if (cf.get("op").exists(_.headOption.contains(0x05.toByte))) {
          val m = Map.newBuilder[Int, (Long, Long, Long)]
          var off = chunkEnd
          var more = off < fileLen
          while (more) {
            val (fields, dlen, next) = headerAt(off)
            val op = fields.get("op").flatMap(_.headOption).getOrElse(0.toByte)
            if (op == 0x04.toByte &&
                fields.get("ver").map(le32).contains(1) &&
                fields.contains("conn") && dlen % 12 == 0) {
              val conn = le32(fields("conn"))
              val n = dlen / 12
              if (n > 0) {
                val data = readAt(next - dlen, dlen)
                var mn = Long.MaxValue
                var mx = Long.MinValue
                var i = 0
                while (i < n) {
                  val t = BagCodec.timeUs(
                    java.util.Arrays.copyOfRange(data, i * 12, i * 12 + 8))
                  if (t < mn) mn = t
                  if (t > mx) mx = t
                  i += 1
                }
                m += conn -> (mn, mx, n.toLong)
              }
              off = next
              more = off < fileLen
            } else more = false
          }
          out += chunkOff -> m.result()
        }
      } catch {
        // torn/corrupt trailing records: leave this chunk unmapped —
        // the caller's count cross-check declines the fast path
        case _: IllegalArgumentException | _: IndexOutOfBoundsException |
             _: java.io.IOException => ()
      }
    }
    out.result()
  }
}

/** array<struct<topic,ts_us,payload>> (+ optional compression literal,
  * none|bz2|lz4) → one ROS bag v2.0 binary.
  */
case class BagPack(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "bag_pack"
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StructType(fields), _), StringType)
        if fields.length == 3 &&
          fields(0).dataType == StringType &&
          fields(1).dataType == LongType &&
          fields(2).dataType == BinaryType =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"bag_pack requires (array<struct<topic:string,ts_us:bigint,payload:binary>>, string), got (${l.simpleString}, ${r.simpleString})")
  }

  override def nullSafeEval(input: Any, comp: Any): Any = {
    val msgs = input.asInstanceOf[ArrayData]
    val n = msgs.numElements()
    val seq = (0 until n).map { i =>
      val m = msgs.getStruct(i, 3)
      if (m == null || m.isNullAt(0) || m.isNullAt(1) || m.isNullAt(2))
        throw new IllegalArgumentException(
          s"bag_pack: message $i has a null struct or null topic/ts_us/payload")
      (m.getUTF8String(0).toString, m.getLong(1), m.getBinary(2))
    }
    BagCodec.pack(seq, comp.asInstanceOf[UTF8String].toString)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** ROS bag v2.0 binary → array<struct<topic,ts_us,payload>> (inverse of
  * [[BagPack]]; reads any conformant v2.0 bag with none/bz2/lz4 chunks).
  */
case class BagUnpack(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "bag_unpack"
  override def dataType: DataType = ArrayType(ContainerCodec.MessageType)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bag_unpack requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val rows = BagCodec.unpack(input.asInstanceOf[Array[Byte]]).map {
      case (topic, tsUs, payload) =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(topic), tsUs, payload))
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `bag_pack_typed(msgs, compression, message_definition[, messages_per_chunk])`
  * — [[BagPack]] with a caller-supplied msg IDL: connection records
  * carry the given `message_definition` (type `graft_msgs/Custom`,
  * genmsg md5) instead of the opaque-blob default, so the packed bag is
  * self-describing for [[RosDeserialize]] — the round a real rosbag
  * writer + bagpy reader make (service/app/main.py:87-94). The optional
  * chunk size (literal int) splits messages across chunk records so the
  * DSv2 scan fans the bag out chunk-parallel.
  */
case class BagPackTyped(first: Expression, second: Expression,
                        third: Expression, messagesPerChunk: Int = Int.MaxValue)
    extends TernaryExpression with CodegenFallback {
  override def prettyName: String = "bag_pack_typed"
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StructType(fields), _), StringType, StringType)
          if fields.length == 3 &&
            fields(0).dataType == StringType &&
            fields(1).dataType == LongType &&
            fields(2).dataType == BinaryType =>
        TypeCheckResult.TypeCheckSuccess
      case (l, c, d) => TypeCheckResult.TypeCheckFailure(
        s"bag_pack_typed requires (array<struct<topic:string,ts_us:bigint," +
          s"payload:binary>>, string, string), got (${l.simpleString}, " +
          s"${c.simpleString}, ${d.simpleString})")
    }

  override def nullSafeEval(input: Any, comp: Any, defn: Any): Any = {
    val msgs = input.asInstanceOf[ArrayData]
    val n = msgs.numElements()
    val seq = (0 until n).map { i =>
      val m = msgs.getStruct(i, 3)
      if (m == null || m.isNullAt(0) || m.isNullAt(1) || m.isNullAt(2))
        throw new IllegalArgumentException(
          s"bag_pack_typed: message $i has a null struct or null topic/ts_us/payload")
      (m.getUTF8String(0).toString, m.getLong(1), m.getBinary(2))
    }
    BagCodec.pack(seq, comp.asInstanceOf[UTF8String].toString,
      messagesPerChunk = messagesPerChunk,
      typeInfo = Some(("graft_msgs/Custom",
        defn.asInstanceOf[UTF8String].toString)))
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
