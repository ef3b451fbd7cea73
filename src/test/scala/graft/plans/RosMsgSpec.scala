package graft.plans

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sources.Containers

/** Typed ROS message (de)serialization: the msg-IDL parser (nested
  * sections, constants, comments, arrays, time), wire-format
  * conformance of decode∘encode, bagpy-style dotted flattening, and the
  * end-to-end file leg — pack typed bags, read them back through the
  * DSv2 source, and get per-field typed columns like
  * `bag.message_by_topic(topic)` (reference service/app/main.py:94,
  * column sniffing at main.py:101-113).
  */
class RosMsgSpec extends SparkSpec {
  import spark.implicits._

  private val poseDef =
    """# a reference-shaped message with a nested header
      |std_msgs/Header header
      |float64 x
      |float64 y
      |string label
      |uint16 flags
      |float32[3] covariance
      |int32[] tags
      |int32 SOME_CONSTANT=42
      |================================================================================
      |MSG: std_msgs/Header
      |uint32 seq
      |time stamp
      |string frame_id
      |""".stripMargin

  test("parser: nested sections, time desugar, constants/comments skipped, dotted flat schema") {
    val schema = RosMsg.flatSchema(RosMsg.parse(poseDef))
    assert(schema.fieldNames.toSeq === Seq(
      "header.seq", "header.stamp.secs", "header.stamp.nsecs",
      "header.frame_id", "x", "y", "label", "flags", "covariance", "tags"))
    assert(schema("header.seq").dataType === LongType)      // uint32
    assert(schema("header.stamp.secs").dataType === LongType)
    assert(schema("header.frame_id").dataType === StringType)
    assert(schema("x").dataType === DoubleType)
    assert(schema("flags").dataType === IntegerType)        // uint16
    assert(schema("covariance").dataType === ArrayType(FloatType, false))
    assert(schema("tags").dataType === ArrayType(IntegerType, false))
  }

  test("md5sum reproduces the published ROS message hashes (genmsg algorithm)") {
    assert(RosMsg.md5sum("uint32 seq\ntime stamp\nstring frame_id\n") ===
      "2176decaecbce78abc3b96ef049fabed") // std_msgs/Header
    assert(RosMsg.md5sum("float64 x\nfloat64 y\nfloat64 z\n") ===
      "4a842b65f413084dc2b10fb484ea7f17") // geometry_msgs/Point
    assert(RosMsg.md5sum("string data\n") ===
      "992ce8a1687cec8c8bd883ec73ca41d1") // std_msgs/String
    // nested resolution: field types replaced by their md5, recursively
    val pointStamped =
      """Header header
        |geometry_msgs/Point point
        |================================================================================
        |MSG: std_msgs/Header
        |uint32 seq
        |time stamp
        |string frame_id
        |================================================================================
        |MSG: geometry_msgs/Point
        |float64 x
        |float64 y
        |float64 z
        |""".stripMargin
    assert(RosMsg.md5sum(pointStamped) ===
      "c63aecb41bfdfd6b7e1fac37c7cbe7bf") // geometry_msgs/PointStamped
    // constants participate in the hash; comments do not
    val withConst = RosMsg.md5sum("uint8 DEBUG=1\nstring msg\n")
    assert(withConst !== RosMsg.md5sum("string msg\n"))
    assert(RosMsg.md5sum("# comment\nstring msg  # trailing\n") ===
      RosMsg.md5sum("string msg\n"))
  }

  test("md5sum: constants AFTER fields still hash constants-first (genmsg order), GoalStatus fixture") {
    // actionlib_msgs/GoalStatus declares its uint8 constants BETWEEN the
    // status field and the text field; genmsg's compute_md5_text emits
    // ALL constants before ALL fields, so interleaved declarations must
    // still reproduce the published hash.
    val goalStatus =
      """GoalID goal_id
        |uint8 status
        |uint8 PENDING         = 0   # The goal has yet to be processed by the action server
        |uint8 ACTIVE          = 1   # The goal is currently being processed by the action server
        |uint8 PREEMPTED       = 2   # The goal received a cancel request after it started executing
        |                            #   and has since completed its execution (Terminal State)
        |uint8 SUCCEEDED       = 3   # The goal was achieved successfully by the action server (Terminal State)
        |uint8 ABORTED         = 4   # The goal was aborted during execution by the action server due
        |                            #    to some failure (Terminal State)
        |uint8 REJECTED        = 5   # The goal was rejected by the action server without being processed,
        |                            #    because the goal was unattainable or invalid (Terminal State)
        |uint8 PREEMPTING      = 6   # The goal received a cancel request after it started executing
        |                            #    and has not yet completed execution
        |uint8 RECALLING       = 7   # The goal received a cancel request before it started executing,
        |                            #    but the action server has not yet confirmed that the goal is canceled
        |uint8 RECALLED        = 8   # The goal received a cancel request before it started executing
        |                            #    and was successfully cancelled (Terminal State)
        |uint8 LOST            = 9   # An action client can determine that a goal is LOST. This should not be
        |                            #    sent over the wire by an action server
        |
        |#Allow for the user to associate a string with GoalStatus for debugging
        |string text
        |================================================================================
        |MSG: actionlib_msgs/GoalID
        |# The stamp should store the time at which this goal was requested.
        |time stamp
        |# The id provides a way to associate feedback and status with goals.
        |string id
        |""".stripMargin
    assert(RosMsg.md5sum(goalStatus) === "d388f9b87b3c471f784434d671988d4a")
    // string constants keep '#' — it is part of the value, not a comment
    assert(RosMsg.md5sum("string SIGIL=a#b\nstring msg\n") !==
      RosMsg.md5sum("string SIGIL=a\nstring msg\n"))
  }

  test("flattened leaf layout is memoized per parsed message (hot decode loop allocates no layout)") {
    val m = RosMsg.parseCached(poseDef)
    assert(m.leaves eq m.leaves) // same cached array instance
    assert(RosMsg.parseCached(poseDef) eq m) // parse memoized → layout shared
    assert(m.leaves.map(_._1).toSeq === RosMsg.leafNames(m))
  }

  test("decode matches a hand-serialized wire message (public serialization rules)") {
    // hand-build: uint32 seq=7, time(secs=3,nsecs=500), string "map",
    // x=1.5, y=-2.5, label="obj", flags=65535, covariance=[1,2,3], tags=[-1,9]
    val bb = java.nio.ByteBuffer.allocate(256)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(7).putInt(3).putInt(500)
    bb.putInt(3).put("map".getBytes(UTF_8))
    bb.putDouble(1.5).putDouble(-2.5)
    bb.putInt(3).put("obj".getBytes(UTF_8))
    bb.putShort(0xFFFF.toShort)
    bb.putFloat(1f).putFloat(2f).putFloat(3f)
    bb.putInt(2).putInt(-1).putInt(9)
    val payload = java.util.Arrays.copyOf(bb.array(), bb.position())

    val row = RosMsg.decode(payload, RosMsg.parse(poseDef))
    assert(row.getLong(0) === 7L)
    assert(row.getLong(1) === 3L)
    assert(row.getLong(2) === 500L)
    assert(row.getUTF8String(3).toString === "map")
    assert(row.getDouble(4) === 1.5)
    assert(row.getDouble(5) === -2.5)
    assert(row.getUTF8String(6).toString === "obj")
    assert(row.getInt(7) === 65535)
    assert(row.getArray(8).toFloatArray().toSeq === Seq(1f, 2f, 3f))
    assert(row.getArray(9).toIntArray().toSeq === Seq(-1, 9))
    // encode round-trips byte-for-byte
    assert(RosMsg.encode(row, RosMsg.parse(poseDef)).toSeq === payload.toSeq)
  }

  test("trailing bytes and corrupt lengths fail loudly") {
    val m = RosMsg.parse("int32 a\n")
    intercept[IllegalArgumentException] {
      RosMsg.decode(Array[Byte](1, 0, 0, 0, 99), m) // 1 trailing byte
    }
    intercept[IllegalArgumentException] {
      RosMsg.decode(Array[Byte](-1, -1, -1, 127), RosMsg.parse("string s\n"))
    }
  }

  test("ros_serialize/ros_deserialize expressions roundtrip through DataFrames") {
    GraftExtensions.register(spark)
    val simpleDef = "uint32 seq\nfloat64 v\nstring name\n"
    val df = spark.range(5).select(
      struct(col("id").as("seq"),
        (col("id") * 1.5).as("v"),
        concat(lit("n"), col("id")).as("name")).as("m"))
    val out = df.select(Containers.rosDeserialize(
        Containers.rosSerialize(col("m"), lit(simpleDef)), lit(simpleDef)).as("d"))
      .select(col("d.seq"), col("d.v"), col("d.name"))
      .as[(Long, Double, String)].collect().toSeq.sortBy(_._1)
    assert(out === (0L until 5L).map(i => (i, i * 1.5, s"n$i")))
  }

  test("ros_deserialize rejects a non-literal definition (schema needed at analysis)") {
    GraftExtensions.register(spark)
    val df = spark.range(1).select(lit(Array[Byte](1, 0, 0, 0)).as("p"),
      lit("int32 a\n").as("d"))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(Containers.rosDeserialize(col("p"), col("d"))).collect()
    }
    assert(e.getMessage.contains("literal"))
  }

  test("the reference's full loop: typed bag → message_by_topic → YAML column sniff → extraction") {
    // main.py:87-113 end to end on a REAL bag: bagreader → per-field
    // typed columns → find the column holding "k: v" objects → parse it
    GraftExtensions.register(spark)
    val objDef = "float64 lat\nstring detections\n"
    val dir = Files.createTempDirectory("graft-bagsniff").toString
    val msgs = (0 until 6).map { i =>
      val det = s"x: ${i * 3}, y: ${i * 7}".getBytes(UTF_8)
      val bb = java.nio.ByteBuffer.allocate(12 + det.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putDouble(40.0 + i).putInt(det.length).put(det)
      ("objects", 2000000L + i, bb.array())
    }
    Files.write(Paths.get(dir, "sniffed.bag"),
      BagCodec.pack(msgs, "bz2", typeInfo = Some(("graft_msgs/Det", objDef))))

    val typed = Containers.readBagTyped(spark, dir, "objects")
      .withColumn("topic", lit("objects"))
    val extracted = graft.operators.Signals.topicExtractAll(
      typed, "topic", Seq("objects"), Seq("detections"),
      Map("bag_file_prefix" -> "test"))
    val rows = extracted
      .select(col("ts_us"), col("lat"),
        col("detections_objs")(0)("x").as("x"),
        col("detections_objs")(0)("y").as("y"))
      .as[(Long, Double, String, String)].collect().toSeq.sortBy(_._1)
    assert(rows === (0 until 6).map(i =>
      (2000000L + i, 40.0 + i, (i * 3).toString, (i * 7).toString)))
  }

  test("end-to-end file leg: typed bags → bagConnections → readBagTyped, dotted columns like bagpy") {
    GraftExtensions.register(spark)
    val gpsDef = "float64 lat\nfloat64 lng\ntime stamp\n"
    val dir = Files.createTempDirectory("graft-bagtyped").toString
    // synthesize two bags whose payloads are real serialized messages
    def mkBag(name: String, comp: String, n: Int): Unit = {
      val msgs = (0 until n).map { i =>
        val bb = java.nio.ByteBuffer.allocate(24)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.putDouble(10.0 + i).putDouble(-20.0 - i).putInt(i).putInt(i * 1000)
        ("gps", 1000000L + i, bb.array())
      }
      Files.write(Paths.get(dir, s"$name.bag"),
        BagCodec.pack(msgs, comp, typeInfo = Some(("sensor_msgs/NavSat", gpsDef))))
    }
    mkBag("run_a", "none", 3)
    mkBag("run_b", "lz4", 2)

    // the connection table carries the embedded IDL per bag
    val conns = Containers.bagConnections(spark, dir)
    assert(conns.count() === 2L)
    assert(conns.select("topic").distinct().as[String].collect().toSeq === Seq("gps"))
    assert(conns.select("message_definition").distinct()
      .as[String].collect().toSeq === Seq(gpsDef))
    assert(conns.select("msg_type").distinct()
      .as[String].collect().toSeq === Seq("sensor_msgs/NavSat"))

    // typed read: per-field columns, the reference's lat/lng sniff works
    val typed = Containers.readBagTyped(spark, dir, "gps")
    assert(typed.columns.toSeq ===
      Seq("bag_file", "ts_us", "lat", "lng", "stamp.secs", "stamp.nsecs"))
    val rows = typed
      .select(col("bag_file"), col("lat"), col("lng"), col("`stamp.nsecs`"))
      .as[(String, Double, Double, Long)].collect().toSeq.sorted
    assert(rows === Seq(
      ("run_a", 10.0, -20.0, 0L), ("run_a", 11.0, -21.0, 1000L),
      ("run_a", 12.0, -22.0, 2000L),
      ("run_b", 10.0, -20.0, 0L), ("run_b", 11.0, -21.0, 1000L)).sorted)
  }
}
