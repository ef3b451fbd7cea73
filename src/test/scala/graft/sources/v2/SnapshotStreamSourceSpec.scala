package graft.sources.v2

import org.apache.spark.sql.streaming.StreamingQueryException

import graft.SparkSpec
import graft.sources.SnapshotStore

/** The commit-log streaming source: initial snapshot + exact version-
  * offset increments, restart replay, rewrite refusal/skip, tail mode.
  */
class SnapshotStreamSourceSpec extends SparkSpec {
  import spark.implicits._

  private val fmt = classOf[SnapshotDataSource].getName

  private def fresh(tag: String): String =
    "file:" + java.nio.file.Files
      .createTempDirectory(s"graft-snapstream-$tag").toString + "/t"

  private def startQuery(table: String, name: String,
                         ckpt: String, opts: Map[String, String] = Map.empty) = {
    val reader = spark.readStream.format(fmt)
    opts.foreach { case (k, v) => reader.option(k, v) }
    reader.load(table).writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt).outputMode("append").start()
  }

  test("initial snapshot, then exactly the appended files per batch") {
    val t = fresh("inc")
    SnapshotStore.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t)
    val q = startQuery(t, "snap_inc", t.stripPrefix("file:") + "/_ckpt")
    try {
      q.processAllAvailable()
      assert(spark.table("snap_inc").select("id").as[Long].collect().toSet
        === Set(1L, 2L))
      SnapshotStore.append(Seq((3L, "c")).toDF("id", "v"), t)
      SnapshotStore.append(Seq((4L, "d")).toDF("id", "v"), t)
      q.processAllAvailable()
      // two appends while idle arrive; nothing re-delivers
      assert(spark.table("snap_inc").select("id").as[Long].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
        === Map(1L -> 1, 2L -> 1, 3L -> 1, 4L -> 1))
    } finally q.stop()
  }

  test("restart from the checkpoint delivers only what landed while down") {
    val t = fresh("restart")
    val ckpt = t.stripPrefix("file:") + "/_ckpt"
    val out = t.stripPrefix("file:") + "/_out"
    // file sink (memory can't recover a checkpoint): re-delivery across
    // the restart would surface as duplicate rows in the output dir
    def run() = {
      val q = spark.readStream.format(fmt).load(t)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    SnapshotStore.append(Seq((1L, "a")).toDF("id", "v"), t)
    run()
    SnapshotStore.append(Seq((2L, "b")).toDF("id", "v"), t) // while down
    run()
    assert(spark.read.parquet(out).select("id").as[Long].collect().sorted.toSeq
      === Seq(1L, 2L))
  }

  test("a follower stalled past the vacuum window fails descriptively and recovers via startingVersion=latest") {
    val t = fresh("stall")
    val ckpt = t.stripPrefix("file:") + "/_ckpt"
    val out = t.stripPrefix("file:") + "/_out"
    def run() = {
      val q = spark.readStream.format(fmt)
        .option("skipRewrites", "true").load(t)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    SnapshotStore.append(Seq((1L, "a")).toDF("id", "v").coalesce(1), t)
    run() // follower processed v1, then STALLS
    // maintenance keeps going: more appends, a compaction, a vacuum
    // that drops the pre-compaction append files past the floor
    (2 to 4).foreach(i =>
      SnapshotStore.append(Seq((i.toLong, "x")).toDF("id", "v").coalesce(1), t))
    SnapshotStore.compact(spark, t, targetFiles = 1)
    SnapshotStore.vacuum(spark, t, retainVersions = 1, graceMs = 0L)
    assert(SnapshotStore.vacuumFloor(spark, t).exists(_ > 2L))
    // the stalled follower resumes: its range references vacuumed
    // files — DESCRIPTIVE refusal naming the recovery recipe, before
    // any scan (not a mid-task FileNotFoundException)
    val ex = intercept[StreamingQueryException] { run() }
    def causes(th: Throwable): Seq[Throwable] =
      if (th == null) Nil else th +: causes(th.getCause)
    val msg = causes(ex).flatMap(c => Option(c.getMessage)).mkString(" | ")
    assert(msg.contains("vacuumed past the retention floor"), msg)
    assert(msg.contains("startingVersion=latest"), msg)
    // the documented recipe works: a FRESH checkpoint tailing from
    // latest delivers post-recovery appends
    val ckpt2 = t.stripPrefix("file:") + "/_ckpt2"
    val q2 = spark.readStream.format(fmt)
      .option("skipRewrites", "true").option("startingVersion", "latest")
      .load(t)
      .writeStream.format("memory").queryName("stall_recovered")
      .option("checkpointLocation", ckpt2).outputMode("append").start()
    try {
      q2.processAllAvailable()
      SnapshotStore.append(Seq((9L, "new")).toDF("id", "v").coalesce(1), t)
      q2.processAllAvailable()
      assert(spark.table("stall_recovered").select("id").as[Long]
        .collect().toSet === Set(9L))
    } finally q2.stop()
  }

  test("a rewrite commit fails the stream by default") {
    val t = fresh("rewrite")
    SnapshotStore.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t)
    val q = startQuery(t, "snap_rw", t.stripPrefix("file:") + "/_ckpt")
    try {
      q.processAllAvailable()
      SnapshotStore.append(Seq((3L, "c")).toDF("id", "v"), t)
      SnapshotStore.compact(spark, t, targetFiles = 1)
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      assert(e.getCause.getMessage.contains("only sound across appends"))
    } finally q.stop()
  }

  test("skipRewrites=true rides through compaction without re-delivery") {
    val t = fresh("skip")
    SnapshotStore.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t)
    val q = startQuery(t, "snap_skip", t.stripPrefix("file:") + "/_ckpt",
      Map("skipRewrites" -> "true"))
    try {
      q.processAllAvailable()
      SnapshotStore.compact(spark, t, targetFiles = 1)
      SnapshotStore.append(Seq((3L, "c")).toDF("id", "v"), t)
      q.processAllAvailable()
      // the compaction's rewrite file never re-delivers 1/2; the append
      // after it still flows
      assert(spark.table("snap_skip").select("id").as[Long].collect().toSet
        === Set(1L, 2L, 3L))
      assert(spark.table("snap_skip").count() === 3L)
    } finally q.stop()
  }

  test("readChangeFeed: upsert emits delete+insert pairs, compaction emits nothing") {
    val t = fresh("cdf")
    // ONE data file so the upsert's touched set is deterministic
    SnapshotStore.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1), t,
      statsCols = Seq("id"))
    val q = startQuery(t, "snap_cdf", t.stripPrefix("file:") + "/_ckpt",
      Map("readChangeFeed" -> "true"))
    try {
      q.processAllAvailable()
      // initial load: the snapshot as inserts at its version
      assert(spark.table("snap_cdf")
        .select("id", "_change_type", "_commit_version")
        .as[(Long, String, Long)].collect().toSet
        === Set((1L, "insert", 1L), (2L, "insert", 1L)))
      // an UPSERT mid-stream: key 2 updates, key 3 inserts — the feed
      // must carry the old row's delete, and inserts for the rewritten
      // file's contents (carried-over row 1 pairs off delete+insert:
      // net no-op for a versionwise consumer)
      SnapshotStore.upsert(Seq((2L, "B"), (3L, "c")).toDF("id", "v"), t,
        keyCols = Seq("id"))
      q.processAllAvailable()
      val afterUpsert = spark.table("snap_cdf")
        .filter($"_commit_version" === 2L)
        .select("id", "v", "_change_type")
        .as[(Long, String, String)].collect().toSet
      assert(afterUpsert === Set(
        (1L, "a", "delete"), (2L, "b", "delete"),      // rewritten file out
        (1L, "a", "insert"), (2L, "B", "insert"), (3L, "c", "insert")))
      // net application: delete old, apply inserts → current snapshot
      // COMPACTION: a content-preserving rewrite contributes NO rows
      SnapshotStore.compact(spark, t, targetFiles = 1)
      q.processAllAvailable()
      assert(spark.table("snap_cdf").filter($"_commit_version" === 3L).count() === 0L,
        "compaction has no row-level delta")
      // and the stream is still alive for later commits
      SnapshotStore.append(Seq((4L, "d")).toDF("id", "v"), t)
      q.processAllAvailable()
      assert(spark.table("snap_cdf").filter($"_commit_version" === 4L)
        .select("id", "_change_type").as[(Long, String)].collect().toSet
        === Set((4L, "insert")))
    } finally q.stop()
  }

  test("readChangeFeed restart: the checkpoint replays nothing, later deletes still flow") {
    val t = fresh("cdfrestart")
    val ckpt = t.stripPrefix("file:") + "/_ckpt"
    val out = t.stripPrefix("file:") + "/_out"
    def run() = {
      val q = spark.readStream.format(fmt).option("readChangeFeed", "true")
        .load(t)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    SnapshotStore.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1), t)
    run()
    // while down: a DELETE commit — row-level deletes must arrive after
    // restart, exactly once
    SnapshotStore.delete(spark, t, org.apache.spark.sql.functions.col("id") === 1L)
    run()
    val rows = spark.read.parquet(out)
      .select("id", "_change_type", "_commit_version")
      .as[(Long, String, Long)].collect().toSeq
    assert(rows.size === rows.distinct.size || rows.groupBy(identity).forall(_._2.size == 1),
      s"no duplicate deliveries across restart: $rows")
    assert(rows.toSet === Set((1L, "insert", 1L), (2L, "insert", 1L),
      (1L, "delete", 2L), (2L, "delete", 2L), (2L, "insert", 2L)))
  }

  test("readChangeFeed drives a downstream MIRROR table through arbitrary rewrites") {
    val src = fresh("cdfmirror")
    val dst = fresh("cdfmirror-dst")
    SnapshotStore.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1),
      src, statsCols = Seq("id"))
    // the downstream-sync loop: apply each version's deletes then
    // inserts, in _commit_version order — sound across upserts,
    // deletes, AND compactions (which emit nothing)
    val q = spark.readStream.format(fmt).option("readChangeFeed", "true")
      .load(src)
      .writeStream.option("checkpointLocation",
        src.stripPrefix("file:") + "/_mirror_ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark2 = batch.sparkSession
        import org.apache.spark.sql.functions.col
        val versions = batch.select("_commit_version").distinct()
          .collect().map(_.getLong(0)).sorted
        versions.foreach { ver =>
          val b = batch.filter(col("_commit_version") === ver)
          val delIds = b.filter(col("_change_type") === "delete")
            .select("id").collect().map(_.getLong(0)).toSeq
          if (delIds.nonEmpty && SnapshotStore.latestVersion(spark2, dst) > 0L)
            SnapshotStore.delete(spark2, dst, col("id").isin(delIds: _*))
          val ins = b.filter(col("_change_type") === "insert")
            .drop("_change_type", "_commit_version")
          if (!ins.isEmpty) SnapshotStore.append(ins, dst, statsCols = Seq("id"))
        }
        ()
      }.start()
    def mirrorEqualsSource(): Unit = {
      q.processAllAvailable()
      val s = SnapshotStore.snapshot(spark, src)
        .as[(Long, String)].collect().sorted.toSeq
      val d = SnapshotStore.snapshot(spark, dst)
        .as[(Long, String)].collect().sorted.toSeq
      assert(d === s, s"mirror drifted: src=$s dst=$d")
    }
    try {
      mirrorEqualsSource()                                    // initial load
      SnapshotStore.upsert(Seq((2L, "B"), (3L, "c")).toDF("id", "v"), src,
        keyCols = Seq("id"))
      mirrorEqualsSource()                                    // update + insert
      SnapshotStore.compact(spark, src, targetFiles = 1)
      q.processAllAvailable()                                 // no-op for the mirror
      SnapshotStore.delete(spark, src,
        org.apache.spark.sql.functions.col("id") === 1L)
      mirrorEqualsSource()                                    // delete
    } finally q.stop()
  }

  test("readChangeFeed + skipRewrites is refused") {
    val t = fresh("cdfexcl")
    SnapshotStore.append(Seq((1L, "a")).toDF("id", "v"), t)
    val err = intercept[Exception] {
      spark.readStream.format(fmt)
        .option("readChangeFeed", "true").option("skipRewrites", "true")
        .load(t)
        .writeStream.format("memory").queryName("cdf_excl").start()
        .processAllAvailable()
    }
    assert(err.getMessage.contains("mutually exclusive") ||
      Option(err.getCause).exists(_.getMessage.contains("mutually exclusive")))
  }

  test("startingVersion=latest tails: only post-start appends arrive") {
    val t = fresh("tail")
    SnapshotStore.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t)
    val q = startQuery(t, "snap_tail", t.stripPrefix("file:") + "/_ckpt",
      Map("startingVersion" -> "latest"))
    try {
      q.processAllAvailable()
      assert(spark.table("snap_tail").count() === 0L)
      SnapshotStore.append(Seq((3L, "c")).toDF("id", "v"), t)
      q.processAllAvailable()
      assert(spark.table("snap_tail").select("id").as[Long].collect().toSeq
        === Seq(3L))
    } finally q.stop()
  }

  test("maxVersionsPerTrigger bounds catch-up batches by commit count") {
    val t = fresh("admit")
    val ckpt = t.stripPrefix("file:") + "/_ckpt"
    val out = t.stripPrefix("file:") + "/_out"
    def run(): Int = { // returns non-empty batch count for the run
      val q = spark.readStream.format(fmt)
        .option("maxVersionsPerTrigger", "2").load(t)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      try { q.processAllAvailable(); q.recentProgress.count(_.numInputRows > 0) }
      finally q.stop()
    }
    SnapshotStore.append(Seq((1L, "a")).toDF("id", "v"), t)
    assert(run() === 1) // initial snapshot: one admission unit
    // a 4-version backlog accumulates while the stream is DOWN — the
    // situation admission control exists for; catch-up must split it
    (2L to 5L).foreach(i => SnapshotStore.append(Seq((i, "x")).toDF("id", "v"), t))
    assert(run() === 2, "ceil(4 versions / 2 per trigger) capped batches")
    assert(spark.read.parquet(out).select("id").as[Long].collect().toSet
      === Set(1L, 2L, 3L, 4L, 5L))
  }

  test("startingVersion + maxVersionsPerTrigger: the FIRST batch is capped too") {
    val t = fresh("admitstart")
    val ckpt = t.stripPrefix("file:") + "/_ckpt"
    val out = t.stripPrefix("file:") + "/_out"
    // 6 commits exist BEFORE the stream ever starts; startingVersion=2
    // makes the fresh stream's first batch incremental (versions 3..6) —
    // without anchoring the cap on startingVersion that backlog would
    // arrive as one unbounded batch
    (1L to 6L).foreach(i => SnapshotStore.append(Seq((i, "x")).toDF("id", "v"), t))
    val q = spark.readStream.format(fmt)
      .option("startingVersion", "2")
      .option("maxVersionsPerTrigger", "2").load(t)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    val batches =
      try { q.processAllAvailable(); q.recentProgress.count(_.numInputRows > 0) }
      finally q.stop()
    assert(batches === 2, "ceil(4 versions / 2 per trigger) capped first batches")
    assert(spark.read.parquet(out).select("id").as[Long].collect().toSet
      === Set(3L, 4L, 5L, 6L))
  }

  test("sink-to-source loop: appendSink output is streamable downstream") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val t = fresh("loop")
    val mem = MemoryStream[(Long, String)]
    val up = SnapshotStore.appendSink(mem.toDF().toDF("id", "v"), t)
      .option("checkpointLocation", t.stripPrefix("file:") + "/_upckpt").start()
    try {
      mem.addData((1L, "a"))
      up.processAllAvailable()
      val down = startQuery(t, "snap_loop", t.stripPrefix("file:") + "/_ckpt")
      try {
        down.processAllAvailable()
        mem.addData((2L, "b"))
        up.processAllAvailable()
        down.processAllAvailable()
        assert(spark.table("snap_loop").select("id").as[Long].collect().toSet
          === Set(1L, 2L))
      } finally down.stop()
    } finally up.stop()
  }
}
