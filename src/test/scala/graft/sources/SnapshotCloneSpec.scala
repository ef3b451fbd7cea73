package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Shallow clone: a NEW independent table whose first commit references
  * the source snapshot's live files byte-for-byte — pure log metadata,
  * zero data copied or moved (Delta's shallow CLONE). Schema, column
  * mapping, and constraints carry; streaming-sink watermarks do not.
  * The clone diverges freely (rewrites stage into its OWN data dir) and
  * its vacuum can never delete source bytes.
  */
class SnapshotCloneSpec extends SparkSpec {
  import spark.implicits._

  private def freshBase(tag: String): String =
    "file:" + java.nio.file.Files
      .createTempDirectory(s"graft-clone-$tag").toString

  private def useCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.v2.SnapshotCatalog].getName)

  private def livePaths(t: String): Set[String] =
    SnapshotStore.state(spark, t).live.map(_.path).toSet

  test("clone is metadata-only: same files, nothing staged in the target") {
    val b = freshBase("zero"); val src = s"$b/src"; val dst = s"$b/dst"
    SnapshotStore.append((1L to 6L).map(i => (i, i * 10L)).toDF("id", "score"),
      src, statsCols = Seq("id"))
    SnapshotStore.shallowClone(spark, src, dst)
    assert(livePaths(dst) === livePaths(src),
      "clone must reference the source files verbatim")
    // the clone's own data dir holds zero files (nothing was staged)
    val dstData = new java.io.File(new java.net.URI(s"$dst/data"))
    assert(!dstData.exists() || dstData.listFiles().forall(_.getName.startsWith(".")),
      "shallow clone must stage no data files")
    assert(SnapshotStore.snapshot(spark, dst).orderBy("id")
      .select("score").as[Long].collect().toSeq === (1L to 6L).map(_ * 10L))
    // stats carried verbatim: pruning metadata is part of the AddFiles
    assert(SnapshotStore.state(spark, dst).live.forall(_.stats.contains("id")))
    // a clone onto an existing table is refused
    assert(intercept[IllegalArgumentException] {
      SnapshotStore.shallowClone(spark, src, dst)
    }.getMessage.contains("already has commits"))
  }

  test("divergence: clone rewrites its own copy; source never affected, and vice versa") {
    useCatalog()
    val b = freshBase("div"); val src = s"$b/src"; val dst = s"$b/dst"
    SnapshotStore.append((1L to 8L).map(i => (i, i * 10L)).toDF("id", "score"),
      src, statsCols = Seq("id"))
    SnapshotStore.shallowClone(spark, src, dst)
    val srcLive = livePaths(src)
    // DELETE on the clone: the rewrite stages into the CLONE's data dir
    spark.sql(s"DELETE FROM graft.`$dst` WHERE id <= 4")
    assert(livePaths(src) === srcLive, "a clone rewrite must not touch the source")
    assert(livePaths(dst).forall(p =>
      p.startsWith(s"$src/data") || p.startsWith(s"$dst/data")))
    assert(SnapshotStore.snapshot(spark, dst).count() === 4L)
    assert(SnapshotStore.snapshot(spark, src).count() === 8L)
    // source append after the clone: invisible to the clone
    SnapshotStore.append(Seq((9L, 90L)).toDF("id", "score"), src)
    assert(SnapshotStore.snapshot(spark, dst).count() === 4L)
  }

  test("historical clone pins a past snapshot (time-travel clone)") {
    val b = freshBase("hist"); val src = s"$b/src"; val dst = s"$b/dst"
    SnapshotStore.append(Seq((1L, "a")).toDF("id", "tag"), src) // v1
    SnapshotStore.append(Seq((2L, "b")).toDF("id", "tag"), src) // v2
    SnapshotStore.shallowClone(spark, src, dst, asOf = Some(1L))
    assert(SnapshotStore.snapshot(spark, dst).select("id").as[Long]
      .collect().toSeq === Seq(1L))
    val meta = SnapshotStore.state(spark, dst).meta
    assert(meta("clone.source_version") === "1")
    assert(meta("op") === "clone")
  }

  test("schema machinery carries: column mapping and constraints enforce on the clone") {
    val b = freshBase("meta"); val src = s"$b/src"; val dst = s"$b/dst"
    SnapshotStore.append(Seq((1L, 10L)).toDF("id", "score"), src,
      statsCols = Seq("score"))
    SnapshotStore.renameColumn(spark, src, "score", "points")
    SnapshotStore.addConstraint(spark, src, "pos", "points > 0")
    SnapshotStore.shallowClone(spark, src, dst)
    // mapping carried: the clone reads logical names over physical files
    assert(SnapshotStore.snapshot(spark, dst).columns.toSeq === Seq("id", "points"))
    // constraint carried: violating writes to the CLONE are refused
    intercept[Exception] {
      SnapshotStore.append(Seq((2L, -1L)).toDF("id", "points"), dst)
    }
    SnapshotStore.append(Seq((2L, 20L)).toDF("id", "points"), dst)
    assert(SnapshotStore.snapshot(spark, dst).count() === 2L)
    // constraint lifecycles are independent post-clone
    SnapshotStore.dropConstraint(spark, dst, "pos")
    assert(SnapshotStore.constraints(spark, dst).isEmpty)
    assert(SnapshotStore.constraints(spark, src) === Map("pos" -> "points > 0"))
  }

  test("sink watermarks do NOT carry: the clone is a fresh sink target") {
    val b = freshBase("sink"); val src = s"$b/src"; val dst = s"$b/dst"
    SnapshotStore.append(Seq((1L, "a")).toDF("id", "tag"), src)
    // simulate a streaming sink's replay high-water mark on the source
    SnapshotStore.commit(spark, src, adds = Nil, removes = Nil,
      meta = Map("sink.qid.batch" -> "7"), mustBeLive = Nil)
    SnapshotStore.shallowClone(spark, src, dst)
    val meta = SnapshotStore.state(spark, dst).meta
    assert(!meta.keys.exists(_.startsWith("sink.")),
      s"sink.* must not carry into a clone, got ${meta.keys.filter(_.startsWith("sink."))}")
  }

  test("clone vacuum never deletes source bytes") {
    val b = freshBase("vac"); val src = s"$b/src"; val dst = s"$b/dst"
    SnapshotStore.append((1L to 6L).map(i => (i, i * 10L)).toDF("id", "score"),
      src, statsCols = Seq("id"))
    SnapshotStore.shallowClone(spark, src, dst)
    val srcLive = livePaths(src)
    // rewrite the clone fully into its own dir: all source refs dropped
    SnapshotStore.compact(spark, dst, targetFiles = 1)
    assert(livePaths(dst).forall(_.startsWith(s"$dst/data")))
    // vacuum the clone down to the latest version: the dropped source
    // paths are NOT the clone's to delete (orphan scan covers only the
    // clone's own data dir)
    SnapshotStore.vacuum(spark, dst, retainVersions = 1, graceMs = 0L)
    val fs = new java.io.File(new java.net.URI(s"$src/data"))
    val srcFilesOnDisk = fs.listFiles().filterNot(_.getName.startsWith("."))
      .map(f => s"$src/data/${f.getName}").toSet
    assert(srcLive.subsetOf(srcFilesOnDisk),
      "clone vacuum must never delete the source's data files")
    assert(SnapshotStore.snapshot(spark, src).count() === 6L)
    assert(SnapshotStore.snapshot(spark, dst).count() === 6L)
  }

  test("SQL procedure: CALL graft.clone with and without a version") {
    useCatalog()
    val b = freshBase("sql"); val src = s"$b/src"
    SnapshotStore.append(Seq((1L, "a")).toDF("id", "tag"), src) // v1
    SnapshotStore.append(Seq((2L, "b")).toDF("id", "tag"), src) // v2
    val r1 = spark.sql(s"CALL graft.clone('$src', '$b/c1')").collect().head
    assert(r1.getLong(1) === 2L && r1.getInt(2) === 2) // src version, files
    val r2 = spark.sql(s"CALL graft.clone('$src', '$b/c2', 1)").collect().head
    assert(r2.getLong(1) === 1L)
    assert(SnapshotStore.snapshot(spark, s"$b/c2").count() === 1L)
  }
}
