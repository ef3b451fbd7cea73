package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.plans.BagCodec
import graft.sources.v2.{BagChunkIO, BagDataSource, BagScan}

/** Persisted bag-index manifest: one columnar read replaces per-bag
  * index opens at planning; staleness falls back per file; typed schema
  * inference and IXD-backed aggregates answer from the same manifest.
  */
class BagManifestSpec extends SparkSpec {
  import spark.implicits._

  private val fmt = "graft.sources.v2.BagDataSource"

  private def mkBag(dir: String, name: String, n: Int, comp: String,
                    perChunk: Int): Unit = {
    val msgs = (0 until n).map { i =>
      val topic = Seq("camera", "lidar", "gps")(i % 3)
      (topic, 1000000L + i, s"m$i".getBytes(UTF_8))
    }
    Files.write(Paths.get(dir, s"$name.bag"),
      BagCodec.pack(msgs, comp, messagesPerChunk = perChunk))
  }

  test("manifest answers planning, stats, and IXD aggregates with zero bag opens") {
    val dir = Files.createTempDirectory("graft-bagman").toString
    mkBag(dir, "m_a", 30, "none", perChunk = 7)
    mkBag(dir, "m_b", 10, "bz2", perChunk = 4)
    mkBag(dir, "m_c", 6, "lz4", perChunk = 3)
    val truth = spark.read.format(fmt).load(dir)
      .select("bag_file", "topic", "ts_us")
      .as[(String, String, Long)].collect().sorted.toSeq

    BagManifest.write(spark, dir)
    BagScan.resetPlanProbe()
    val df = spark.read.format(fmt).load(dir)
    val rows = df.select("bag_file", "topic", "ts_us")
      .as[(String, String, Long)].collect().sorted.toSeq
    assert(rows === truth)
    assert(BagScan.planCalls.get() === 0,
      "a fresh manifest must answer every file's plan without opening it")

    // index-only aggregates — counts AND per-topic extremes — from the
    // persisted chunk-info + IXD rows: no bag open, no chunk read
    BagScan.resetPlanProbe()
    BagChunkIO.readCalls.set(0)
    val g = df.groupBy("topic")
      .agg(count(lit(1)).as("n"), min("ts_us"), max("ts_us"))
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(g.map(_._2).sum === 46L)
    // camera = i % 3 == 0: m_a max i=27, m_b max i=9, m_c max i=3
    assert(g.head === (("camera", 16L, 1000000L, 1000027L)))
    assert(BagScan.planCalls.get() === 0 && BagChunkIO.readCalls.get() === 0,
      "manifest-backed aggregate pushdown must not touch any bag file")
  }

  test("staleness: new and changed bags fall back to direct reads, exactly") {
    val dir = Files.createTempDirectory("graft-bagmanstale").toString
    mkBag(dir, "s_a", 12, "none", perChunk = 5)
    mkBag(dir, "s_b", 9, "none", perChunk = 4)
    BagManifest.write(spark, dir)
    // s_b changes CONTENT (different message count => different length);
    // s_c is new — both must be direct-read, s_a stays manifest-answered
    mkBag(dir, "s_b", 15, "none", perChunk = 4)
    mkBag(dir, "s_c", 5, "none", perChunk = 5)
    BagScan.resetPlanProbe()
    val rows = spark.read.format(fmt).load(dir)
      .groupBy("bag_file").count().as[(String, Long)].collect().toMap
    assert(rows === Map("s_a" -> 12L, "s_b" -> 15L, "s_c" -> 5L),
      "stale manifest entries must never answer — results come from the live files")
    assert(BagScan.planCalls.get() === 2,
      s"exactly the changed and the new bag are direct-read, " +
        s"got ${BagScan.planCalls.get()} plan calls")
  }

  test("refresh re-plans ONLY new/changed bags, keeps fresh rows, drops deleted ones") {
    val dir = Files.createTempDirectory("graft-bagmanrefresh").toString
    mkBag(dir, "r_a", 12, "none", perChunk = 5)
    mkBag(dir, "r_b", 9, "bz2", perChunk = 4)
    mkBag(dir, "r_c", 6, "lz4", perChunk = 3)
    BagManifest.resetHarvestProbe()
    BagManifest.write(spark, dir)
    assert(BagManifest.harvested.get() === 3)

    // no changes: refresh is a no-op (same manifest files, zero harvest)
    val sigBefore = new java.io.File(BagManifest.manifestDir(dir))
      .listFiles().map(f => (f.getName, f.lastModified, f.length)).sorted.toSeq
    BagManifest.resetHarvestProbe()
    BagManifest.refresh(spark, dir)
    assert(BagManifest.harvested.get() === 0, "unchanged lake: nothing re-planned")
    val sigAfter = new java.io.File(BagManifest.manifestDir(dir))
      .listFiles().map(f => (f.getName, f.lastModified, f.length)).sorted.toSeq
    assert(sigAfter === sigBefore, "a no-change refresh must not rewrite the manifest")

    // r_b changes content, r_d arrives, r_c is deleted
    mkBag(dir, "r_b", 15, "bz2", perChunk = 4)
    mkBag(dir, "r_d", 5, "none", perChunk = 5)
    Files.delete(Paths.get(dir, "r_c.bag"))
    BagManifest.resetHarvestProbe()
    BagManifest.refresh(spark, dir)
    assert(BagManifest.harvested.get() === 2,
      s"only the changed and the new bag re-plan, got ${BagManifest.harvested.get()}")
    val e = BagManifest.entries(dir, spark.sessionState.newHadoopConf())
    assert(e.keySet.map(p => p.substring(p.lastIndexOf('/') + 1)) ===
      Set("r_a.bag", "r_b.bag", "r_d.bag"), "deleted bags leave the manifest")

    // the refreshed manifest answers planning with zero bag opens, exactly
    BagScan.resetPlanProbe()
    val rows = spark.read.format(fmt).load(dir)
      .groupBy("bag_file").count().as[(String, Long)].collect().toMap
    assert(rows === Map("r_a" -> 12L, "r_b" -> 15L, "r_d" -> 5L))
    assert(BagScan.planCalls.get() === 0,
      "every live file must be manifest-answered after refresh")
  }

  test("typed schema inference answers from the manifest without walking bags") {
    val dir = Files.createTempDirectory("graft-bagmantyped").toString
    val defn = "uint32 v\nstring tag\n"
    val msgs = (0 until 6).map { i =>
      val p = new java.io.ByteArrayOutputStream()
      p.write(java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(i).array())
      val t = s"t$i".getBytes(UTF_8)
      p.write(java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(t.length).array())
      p.write(t)
      ("m", 3000000L + i, p.toByteArray)
    }
    Files.write(Paths.get(dir, "t.bag"),
      BagCodec.pack(msgs, "none", messagesPerChunk = 3,
        typeInfo = Some(("graft_msgs/VT", defn))))
    BagManifest.write(spark, dir)
    BagDataSource.schemaWalks.set(0)
    val df = spark.read.format(fmt)
      .option("typed", "true").option("topic", "m").load(dir)
    assert(df.columns.toSeq === Seq("bag_file", "ts_us", "v", "tag"))
    assert(df.select("v", "tag").as[(Long, String)].collect().sorted.toSeq ===
      (0 until 6).map(i => (i.toLong, s"t$i")))
    assert(BagDataSource.schemaWalks.get() === 0,
      "the manifest's connection rows must answer message_definition lookup")
  }
}
