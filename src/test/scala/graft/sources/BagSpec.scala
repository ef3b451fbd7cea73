package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.plans.BagCodec

/** ROS bag v2.0 codec: roundtrip under all three compressions, wire-format
  * conformance (magic, 4096-byte padded bag header, index_pos,
  * little-endian framing), tolerance of index-less/unchunked bags, and
  * the real binaryFile-directory ingestion (reference:
  * service/app/main.py:87-94 bagreader + message_by_topic).
  */
class BagSpec extends SparkSpec {
  import spark.implicits._

  private val msgs = Seq(
    ("camera", 100000001L, "frame-0".getBytes(UTF_8)),
    ("lidar", 100000002L, Array[Byte](0, 1, 2, -1)),
    ("camera", 100000003L, "".getBytes(UTF_8)), // empty payload survives
    ("gps", 4102444800000000L, "lat:1".getBytes(UTF_8))) // year-2100 secs fit u32

  test("unpack(pack(msgs)) is the identity under none, bz2 AND lz4") {
    for (comp <- Seq("none", "bz2", "lz4")) {
      val bytes = BagCodec.pack(msgs, comp)
      val out = BagCodec.unpack(bytes)
      assert(out.map(m => (m._1, m._2)) === msgs.map(m => (m._1, m._2)), comp)
      assert(out.map(_._3.toSeq) === msgs.map(_._3.toSeq), comp)
    }
    // compression actually engaged: repetitive payloads must shrink
    val fat = (0 until 200).map(i => ("t", i.toLong,
      ("the quick brown fox " * 20).getBytes(UTF_8)))
    val plain = BagCodec.pack(fat, "none").length
    assert(BagCodec.pack(fat, "bz2").length < plain, "bz2 engaged")
    assert(BagCodec.pack(fat, "lz4").length < plain, "lz4 engaged")
    // lz4 chunk data leads with the LZ4 frame magic 0x184D2204 —
    // the public wire format roslz4 streams, not an ad-hoc encoding
    val lz4Bag = BagCodec.pack(fat, "lz4")
    val hay = lz4Bag.toSeq
    val needle = Seq(0x04.toByte, 0x22.toByte, 0x4D.toByte, 0x18.toByte)
    assert(hay.indexOfSlice(needle) >= 0, "LZ4 frame magic present")
  }

  test("wire format is conformant v2.0: magic, padded bag header, LE framing, index_pos") {
    val bytes = BagCodec.pack(msgs, "none")
    assert(new String(bytes.take(13), UTF_8) === "#ROSBAG V2.0\n")
    def u32(off: Int) =
      ByteBuffer.wrap(bytes, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
    def u64(off: Int) =
      ByteBuffer.wrap(bytes, off, 8).order(ByteOrder.LITTLE_ENDIAN).getLong
    // bag header record: <hlen><header><dlen><data>, total exactly 4096
    val hlen = u32(13)
    val dlen = u32(13 + 4 + hlen)
    assert(8 + hlen + dlen === 4096, "bag header record must pad to 4096")
    // its header carries op=0x03; find the op field to check
    val header = bytes.slice(17, 17 + hlen)
    val opIdx = new String(header, UTF_8).indexOf("op=")
    assert(opIdx >= 0 && header(opIdx + 3) === 0x03.toByte)
    // index_pos names a real record boundary holding a connection record
    val ipIdx = new String(header, UTF_8).indexOf("index_pos=")
    val indexPos = u64(17 + ipIdx + 10)
    val connHlen = u32(indexPos.toInt)
    val connHeader = new String(bytes.slice(indexPos.toInt + 4,
      indexPos.toInt + 4 + connHlen), UTF_8)
    assert(connHeader.contains("op="), "index_pos must point at the connection section")
  }

  test("index-less and unchunked bags still read (reindex tolerance)") {
    // hand-assemble: magic | bag header | top-level connection + message
    // records, no chunk, no index — the shape a crashed writer leaves
    val full = BagCodec.pack(Seq(("t", 5000000L, "x".getBytes(UTF_8))), "none")
    def u32(off: Int) =
      ByteBuffer.wrap(full, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
    // walk the full bag once to find the chunk record and its inner bytes
    var pos = 13
    var inner: Array[Byte] = null
    while (inner == null) {
      val hlen = u32(pos)
      val h = new String(full.slice(pos + 4, pos + 4 + hlen), UTF_8)
      val dlen = u32(pos + 4 + hlen)
      if (h.contains("op="))
        inner = full.slice(pos + 8 + hlen, pos + 8 + hlen + dlen)
      pos += 8 + hlen + dlen
    }
    val crashed = full.take(13 + 4096) ++ inner // header then raw records
    val out = BagCodec.unpack(crashed)
    assert(out.map(m => (m._1, m._2, new String(m._3, UTF_8))) ===
      Seq(("t", 5000000L, "x")))
  }

  test("malformed input fails loudly: bad magic, unknown compression, unknown conn") {
    intercept[IllegalArgumentException] {
      BagCodec.unpack("#ROSBAG V1.2\nxxxx".getBytes(UTF_8))
    }
    intercept[IllegalArgumentException] { BagCodec.pack(msgs, "zstd") }
    intercept[IllegalArgumentException] { BagCodec.pack(Seq(("t", -1L, Array[Byte]())), "none") }
  }

  test("bag_pack/bag_unpack expressions roundtrip through a DataFrame") {
    graft.plans.GraftExtensions.register(spark)
    val df = spark.range(1).select(Containers.bagPack(array(
      struct(lit("camera").as("topic"), lit(7L).as("ts_us"),
        encode(lit("p0"), "utf-8").as("payload")),
      struct(lit("lidar").as("topic"), lit(9L).as("ts_us"),
        encode(lit("p1"), "utf-8").as("payload"))), lit("bz2")).as("bag"))
    val out = df.select(explode(Containers.bagUnpack(col("bag"))).as("m"))
      .select(col("m.topic"), col("m.ts_us"),
        decode(col("m.payload"), "utf-8").as("p"))
      .as[(String, Long, String)].collect().toSeq
    assert(out === Seq(("camera", 7L, "p0"), ("lidar", 9L, "p1")))
  }

  test("readBagFiles: a directory of real .bag files becomes per-message rows") {
    val dir = Files.createTempDirectory("graft-bags")
    Files.write(Paths.get(dir.toString, "run_a.bag"),
      BagCodec.pack(Seq(
        ("camera", 1L, "a0".getBytes(UTF_8)),
        ("lidar", 2L, "a1".getBytes(UTF_8))), "none"))
    Files.write(Paths.get(dir.toString, "run_b.bag"),
      BagCodec.pack(Seq(("camera", 3L, "b0".getBytes(UTF_8))), "bz2"))
    val rows = Containers.readBagFiles(spark, dir.toString)
      .select(col("bag_file"), col("topic"), col("ts_us"),
        decode(col("payload"), "utf-8").as("p"))
      .as[(String, String, Long, String)].collect().toSet
    assert(rows === Set(
      ("run_a", "camera", 1L, "a0"), ("run_a", "lidar", 2L, "a1"),
      ("run_b", "camera", 3L, "b0")))
    // provenance + topic split compose with the per-topic store exactly
    // like the container path (same downstream TopicStore contract)
    val byTopic = Containers.readBagFiles(spark, dir.toString)
      .groupBy("topic").count().as[(String, Long)].collect().toMap
    assert(byTopic === Map("camera" -> 2L, "lidar" -> 1L))
  }
}
