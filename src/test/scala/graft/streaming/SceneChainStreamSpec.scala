package graft.streaming

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Scenes, Signals}
import graft.plans.BagCodec
import graft.sources.SnapshotStore

/** The reference chain END TO END, STREAMING: each arriving `.bag` is a
  * micro-batch (upload-triggered, exactly the reference's S3-event
  * shape), and foreachBatch runs the full batch chain — typed decode →
  * per-drive grid synchronize with forward fill → zero-crossing scene
  * metadata — landing scenes in a snapshot table by (user, start_time)
  * upsert. A bag carries COMPLETE drive segments (the reference's unit
  * of work: process_file handles whole bags), so per-batch synchronize
  * is exact, and the keyed upsert makes replays idempotent — restart
  * resumes without duplicate or missing scenes. Final state must equal
  * the BATCH chain over the same bag directory (q_bag_scene_pipeline's
  * composition), proving streaming and batch are the same program.
  */
class SceneChainStreamSpec extends SparkSpec {
  import spark.implicits._

  private val fmt = "graft.sources.v2.BagDataSource"
  private val defn = "uint32 user\nuint32 np\n"
  private val StepUs = 2000000L

  // one drive segment per user: 12 samples, 1s apart, people-count
  // pattern with clean 0<->nonzero transitions
  private val pattern = Seq(0, 0, 1, 2, 0, 0, 3, 0, 1, 1, 0, 0)

  private def writeBag(dir: String, name: String, users: Seq[Int]): Unit = {
    val msgs = for (u <- users; i <- pattern.indices) yield {
      val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(u).putInt(pattern(i))
      ("np", u * 1000000000L + i * 1000000L, bb.array())
    }
    Files.write(Paths.get(dir, s"$name.bag"),
      BagCodec.pack(msgs, "lz4", messagesPerChunk = 8,
        typeInfo = Some(("graft_msgs/NP", defn))))
  }

  /** synchronize + scenes — the SAME code both modes run. */
  private def scenesOf(typed: DataFrame): DataFrame = {
    val tall = typed.select(col("user").as("user_id"), col("ts_us").as("ts"),
      lit("np").as("topic"), col("np").cast("double").as("value"))
    val sync = Signals.synchronize(tall, groupCols = Seq("user_id"),
      timeCol = "ts", topicCol = "topic", valueCol = "value",
      topics = Seq("np"), stepUs = StepUs)
    Scenes.metadata(
      Scenes.boundaries(sync, Seq("user_id"), "ts", Nil, col("np")),
      Seq("user_id"), "ts", "PersonInLane", Seq("np"))
  }

  test("bag stream -> typed -> synchronize -> scenes -> keyed upsert; equals batch; restart-exact") {
    val dir = Files.createTempDirectory("graft-scenestream").toString
    val table = "file:" + Files.createTempDirectory("graft-scenes-snap").toString + "/t"
    val ckpt = Files.createTempDirectory("graft-scenes-ckpt").toString
    writeBag(dir, "wave1", Seq(1, 2))
    def start() = spark.readStream.format(fmt)
      .option("typed", "true").option("topic", "np").load(dir)
      .select(col("user"), col("ts_us"), col("np"))
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          SnapshotStore.upsert(scenesOf(batch), table,
            keyCols = Seq("user_id", "start_time"))
        ()
      }.start()
    val q = start()
    try {
      q.processAllAvailable()
      val wave1 = SnapshotStore.snapshot(spark, table)
      assert(wave1.select("user_id").distinct().as[Long].collect().sorted
        === Array(1L, 2L))
      assert(wave1.count() > 0)
      // a new drive uploads mid-stream: its scenes append, wave1's stay
      writeBag(dir, "wave2", Seq(3))
      q.processAllAvailable()
    } finally q.stop()
    // restart on the same checkpoint + another upload: no replays, no loss
    writeBag(dir, "wave3", Seq(4, 5))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    // final state == the BATCH chain over the whole directory
    val streamed = SnapshotStore.snapshot(spark, table)
      .select("user_id", "start_time", "end_time", "activity_at_start",
        "scene_id", "scene_length", "topics_analyzed")
      .orderBy("user_id", "start_time").collect().toSeq
    val batch = scenesOf(spark.read.format(fmt)
      .option("typed", "true").option("topic", "np").load(dir)
      .select(col("user"), col("ts_us"), col("np")))
      .select("user_id", "start_time", "end_time", "activity_at_start",
        "scene_id", "scene_length", "topics_analyzed")
      .orderBy("user_id", "start_time").collect().toSeq
    assert(streamed === batch,
      "streaming chain must land exactly the batch chain's scene table")
    assert(streamed.map(_.getLong(0)).distinct.sorted === Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("scene table CDF drives a downstream MIRROR through upserts and compaction") {
    // the reference's DynamoDB-reader story closed end-to-end in
    // streaming: bags -> scene snapshot (keyed upsert) -> change feed ->
    // an exact downstream mirror, riding through replayed-wave upserts
    // (delete+insert pairs) and compaction (emits nothing)
    val dir = Files.createTempDirectory("graft-scenemirror").toString
    val scenes = "file:" + Files
      .createTempDirectory("graft-scenemirror-t").toString + "/scenes"
    val mirror = "file:" + Files
      .createTempDirectory("graft-scenemirror-m").toString + "/mirror"
    val ckptChain = Files.createTempDirectory("graft-scenemirror-ck1").toString
    val ckptMirror = Files.createTempDirectory("graft-scenemirror-ck2").toString
    writeBag(dir, "wave1", Seq(1, 2))
    val chain = spark.readStream.format(fmt)
      .option("typed", "true").option("topic", "np").load(dir)
      .select(col("user"), col("ts_us"), col("np"))
      .writeStream.option("checkpointLocation", ckptChain)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          SnapshotStore.upsert(scenesOf(batch), scenes,
            keyCols = Seq("user_id", "start_time"))
        ()
      }.start()
    chain.processAllAvailable()
    // mirror loop: per _commit_version, apply deletes (composite scene
    // key) then inserts — the proven CDF sync shape over the SCENE table
    def startSync() = spark.readStream
      .format(classOf[graft.sources.v2.SnapshotDataSource].getName)
      .option("readChangeFeed", "true").load(scenes)
      .writeStream.option("checkpointLocation", ckptMirror)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark2 = batch.sparkSession
        val versions = batch.select("_commit_version").distinct()
          .collect().map(_.getLong(0)).sorted
        versions.foreach { ver =>
          val b = batch.filter(col("_commit_version") === ver)
          val delKeys = b.filter(col("_change_type") === "delete")
            .select("user_id", "start_time").collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSeq
          if (delKeys.nonEmpty && SnapshotStore.latestVersion(spark2, mirror) > 0L)
            SnapshotStore.delete(spark2, mirror,
              delKeys.map { case (u, st) =>
                col("user_id") === u && col("start_time") === st
              }.reduce(_ || _))
          val ins = b.filter(col("_change_type") === "insert")
            .drop("_change_type", "_commit_version")
          if (!ins.isEmpty)
            SnapshotStore.append(ins, mirror,
              statsCols = Seq("user_id", "start_time"))
        }
        ()
      }.start()
    var sync = startSync()
    def mirrorEqualsScenes(): Unit = {
      sync.processAllAvailable()
      val cols = Seq("user_id", "start_time", "end_time",
        "activity_at_start", "scene_id", "scene_length", "topics_analyzed")
      val s = SnapshotStore.snapshot(spark, scenes)
        .select(cols.head, cols.tail: _*)
        .orderBy("user_id", "start_time").collect().toSeq
      val m = SnapshotStore.snapshot(spark, mirror)
        .select(cols.head, cols.tail: _*)
        .orderBy("user_id", "start_time").collect().toSeq
      assert(s.nonEmpty && m === s, s"mirror drifted: scenes=$s mirror=$m")
    }
    try {
      mirrorEqualsScenes() // initial load
      // wave2 REPLAYS user 1 (same keys -> upsert delete+insert pairs)
      // and adds user 3 — the mirror must apply both, in version order
      writeBag(dir, "wave2", Seq(1, 3))
      chain.processAllAvailable()
      mirrorEqualsScenes()
      // compaction is content-preserving: the feed emits nothing and
      // the mirror must not drift
      SnapshotStore.compact(spark, scenes, targetFiles = 1)
      mirrorEqualsScenes()
      // one more wave AFTER compaction still flows through
      writeBag(dir, "wave3", Seq(4))
      chain.processAllAvailable()
      mirrorEqualsScenes()
      // RESTART leg: kill the mirror stream, land a wave that BOTH
      // replays user 4 (upsert delete+insert on existing keys) and adds
      // user 5 while the mirror is down, then resume from the same
      // checkpoint — exactly the missed versions apply, nothing replays
      sync.stop()
      writeBag(dir, "wave4", Seq(4, 5))
      chain.processAllAvailable()
      sync = startSync()
      mirrorEqualsScenes()
      assert(SnapshotStore.snapshot(spark, mirror)
        .select("user_id").distinct().as[Long].collect().sorted
        === Array(1L, 2L, 3L, 4L, 5L))
    } finally { chain.stop(); sync.stop() }
  }
}
