package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Containers: pack/unpack inverse, real binaryFile-directory ingestion
  * with provenance, and the per-topic partitioned extraction stage
  * (reference: service/app/main.py:77-124).
  */
class ContainersSpec extends SparkSpec {
  import spark.implicits._

  private def msgRow(topic: String, ts: Long, payload: String) =
    struct(lit(topic).as("topic"), lit(ts).as("ts_us"),
      encode(lit(payload), "utf-8").as("payload"))

  test("unpack(pack(msgs)) is the identity") {
    graft.plans.GraftExtensions.register(spark)
    val df = spark.range(1).select(
      Containers.pack(array(
        msgRow("camera", 100L, "frame-0"),
        msgRow("lidar", 101L, ""),          // empty payload survives
        msgRow("camera", 102L, "frame-1"))).as("blob"))
    val out = df.select(explode(Containers.unpack(col("blob"))).as("m"))
      .select(col("m.topic"), col("m.ts_us"), decode(col("m.payload"), "utf-8").as("p"))
      .as[(String, Long, String)].collect().toSeq
    assert(out == Seq(("camera", 100L, "frame-0"), ("lidar", 101L, ""),
      ("camera", 102L, "frame-1")))
  }

  test("property: random message batches round-trip exactly") {
    graft.plans.GraftExtensions.register(spark)
    val rnd = new scala.util.Random(7) // deterministic
    val batches = Seq.fill(40) {
      Seq.fill(rnd.nextInt(6)) {
        val topic = "t" + rnd.nextInt(4)
        val ts = rnd.nextLong() & Long.MaxValue
        val payload = Array.fill(rnd.nextInt(32))(rnd.nextInt(256).toByte)
        (topic, ts, payload)
      }
    }
    val df = batches.zipWithIndex
      .map { case (b, i) => (i.toLong, b.map(m => (m._1, m._2, m._3))) }
      .toDF("id", "msgs")
      .select(col("id"), Containers.pack(
        transform(col("msgs"),
          m => struct(m.getField("_1").as("topic"), m.getField("_2").as("ts_us"),
            m.getField("_3").as("payload")))).as("blob"))
    val back = df.select(col("id"), Containers.unpack(col("blob")).as("out"))
      .select(col("id"), to_json(transform(col("out"), m =>
        struct(m.getField("topic"), m.getField("ts_us"),
          base64(m.getField("payload")).as("p")))).as("j"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    batches.zipWithIndex.foreach { case (b, i) =>
      val expect = b.map { case (t, ts, p) =>
        s"""{"topic":"$t","ts_us":$ts,"p":"${java.util.Base64.getEncoder.encodeToString(p)}"}"""
      }.mkString("[", ",", "]")
      assert(back(i.toLong) == expect, s"batch $i")
    }
  }

  test("empty containers and empty message lists round-trip") {
    graft.plans.GraftExtensions.register(spark)
    val df = spark.range(1).select(
      Containers.pack(array().cast("array<struct<topic:string,ts_us:bigint,payload:binary>>")).as("blob"))
    val out = df.select(size(Containers.unpack(col("blob"))).as("n")).head()
    assert(out.getInt(0) == 0)
  }

  test("DataSourceV2 reader: per-file partitions, provenance, column pruning") {
    graft.plans.GraftExtensions.register(spark)
    val dir = Files.createTempDirectory("graft-bags-v2").toString
    val blobs = spark.range(3).select(col("id"),
      Containers.pack(array(
        msgRow("camera", 1L, "a"), msgRow("lidar", 2L, "bb"))).as("blob"))
      .collect()
    blobs.foreach { r =>
      Files.write(Paths.get(s"$dir/bag_${r.getLong(0)}.bin"), r.getAs[Array[Byte]]("blob"))
    }
    val df = spark.read.format("graft.sources.v2.ContainerDataSource").load(dir)
    assert(df.schema.fieldNames.toSeq == Seq("bag_file", "topic", "ts_us", "payload"))
    assert(df.count() == 6)
    assert(df.rdd.getNumPartitions == 3) // one partition per container file
    val full = df.orderBy("bag_file", "ts_us")
      .select(col("bag_file"), col("topic"), col("ts_us"),
        decode(col("payload"), "utf-8").as("p"))
      .as[(String, String, Long, String)].collect().toSeq
    assert(full.take(2) == Seq(("bag_0", "camera", 1L, "a"), ("bag_0", "lidar", 2L, "bb")))
    // column pruning reaches the reader: the scan's output shrinks
    val pruned = df.select("topic")
    val scanOutput = pruned.queryExecution.executedPlan.collectLeaves()
      .head.output.map(_.name)
    assert(scanOutput == Seq("topic"), scanOutput)
    assert(pruned.distinct().as[String].collect().toSet == Set("camera", "lidar"))
    // topic predicate pushes into the reader: the source accepted it, so
    // the plan has NO residual Filter, yet only camera rows come back
    val filtered = df.filter(col("topic") === "camera").select("bag_file", "ts_us")
    val hasResidualFilter = filtered.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }.nonEmpty
    assert(!hasResidualFilter,
      filtered.queryExecution.executedPlan.toString.take(800))
    assert(filtered.count() == 3)
  }

  test("DSv2 streaming: each arriving container file becomes a micro-batch") {
    graft.plans.GraftExtensions.register(spark)
    val dir = Files.createTempDirectory("graft-bags-stream").toString
    def writeBag(i: Long): Unit = {
      val blob = spark.range(1).select(
        Containers.pack(array(msgRow(s"topic_$i", i, s"payload_$i"))).as("b"))
        .head().getAs[Array[Byte]]("b")
      Files.write(Paths.get(s"$dir/bag_$i.bin"), blob)
    }
    writeBag(0); writeBag(1)
    val stream = spark.readStream
      .format("graft.sources.v2.ContainerDataSource").load(dir)
      .select("bag_file", "topic", "ts_us")
    val q = stream.writeStream.format("memory").queryName("bags")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("bags").count() == 2)
      writeBag(2) // a new "upload" arrives → next micro-batch picks it up
      q.processAllAvailable()
      val rows = spark.table("bags").orderBy("ts_us")
        .as[(String, String, Long)].collect().toSeq
      assert(rows == Seq(("bag_0", "topic_0", 0L), ("bag_1", "topic_1", 1L),
        ("bag_2", "topic_2", 2L)))
    } finally q.stop()
  }

  test("micro-batch container stream composes with multi-topic extraction") {
    // the full live path: container file arrives → micro-batch → decode
    // payloads → topicExtractAllWith parses each configured topic's
    // schema — the reference's per-upload trigger + process_file loop as
    // one streaming plan
    graft.plans.GraftExtensions.register(spark)
    val dir = Files.createTempDirectory("graft-bags-extract").toString
    def writeBag(name: String, msgs: Seq[(String, Long, String)]): Unit = {
      val blob = spark.range(1).select(
        Containers.pack(array(msgs.map { case (t, ts, p) => msgRow(t, ts, p) }: _*)).as("b"))
        .head().getAs[Array[Byte]]("b")
      Files.write(Paths.get(s"$dir/$name.bin"), blob)
    }
    writeBag("bag_a", Seq(("cam", 1L, "[x: 1, y: 2]"), ("imu", 2L, "noise")))
    val keys = Map(("cam", "payload_str") -> "x", ("gps", "payload_str") -> "lat")
    val stream = spark.readStream
      .format("graft.sources.v2.ContainerDataSource").load(dir)
      .select(col("bag_file"), col("topic"), col("ts_us"),
        decode(col("payload"), "utf-8").as("payload_str"))
    val out = graft.operators.Signals.topicExtractAllWith(
      stream, "topic", Seq("cam", "gps"), Seq("payload_str"), keys,
      Map("pipeline" -> "live"))
    val q = out.writeStream.format("memory").queryName("bag_topics")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      writeBag("bag_b", Seq(("gps", 3L, "[lat: 7, lon: 8]")))
      q.processAllAvailable()
      val rows = spark.table("bag_topics")
        .select(col("bag_file"), col("topic"),
          element_at(col("payload_str_objs"), 1).as("o"))
        .collect()
        .map(r => r.getString(1) -> (r.getString(0),
          r.getAs[scala.collection.Map[String, String]]("o"))).toMap
      // imu is unconfigured → dropped; both bags' configured topics parse
      assert(rows.keySet == Set("cam", "gps"))
      assert(rows("cam")._1 == "bag_a" && rows("cam")._2("y") == "2")
      assert(rows("gps")._1 == "bag_b" && rows("gps")._2("lat") == "7")
    } finally q.stop()
  }

  test("binaryFile directory read splits containers per topic with provenance") {
    graft.plans.GraftExtensions.register(spark)
    val dir = Files.createTempDirectory("graft-bags").toString
    // two container files = two "bags"
    val blobs = spark.range(2).select(col("id"),
      Containers.pack(array(
        msgRow("camera", 1L, "a"), msgRow("lidar", 2L, "b"))).as("blob"))
      .collect()
    blobs.foreach { r =>
      Files.write(Paths.get(s"$dir/bag_${r.getLong(0)}.bin"), r.getAs[Array[Byte]]("blob"))
    }
    val msgs = Containers.readContainerFiles(spark, dir)
    assert(msgs.count() == 4)
    assert(msgs.select("bag_file").distinct().as[String].collect().toSet ==
      Set("bag_0", "bag_1"))
    // extraction stage: per-topic partitioned store, pruned topic read
    val store = Files.createTempDirectory("graft-store").toString
    Containers.extractToStore(spark, dir, store, Seq("camera"))
    val cam = TopicStore.readTopic(spark, store, "camera")
    assert(cam.count() == 2 &&
      cam.select("topic").distinct().as[String].collect().toSeq == Seq("camera"))
  }
}
