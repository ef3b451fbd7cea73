package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deletion vectors — merge-on-read deletes (Delta's DVs / Iceberg's
  * position deletes): with `graft.dv` set, DELETE writes a tiny
  * positional dataset and repoints the touched files at it in ONE
  * commit; no data file is rewritten. Reads anti-join the log-pointed
  * positions (DV-less files keep the plain plan); SQL reads go through
  * the [[graft.plans.RewriteDvReads]] analyzer rewrite. Pointers are
  * immutable data + moving references, so time travel, RESTORE, the
  * change feed, purge (REORG), vacuum, and copy-on-write interop all
  * stay exact.
  */
class SnapshotDvSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(tag: String): String =
    "file:" + java.nio.file.Files
      .createTempDirectory(s"graft-dv-$tag").toString + "/t"

  private def useCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.v2.SnapshotCatalog].getName)

  private def seed(t: String, n: Long = 20L): Unit = {
    // one file: per-file dv ratios in these specs assume a single file
    SnapshotStore.append((1L to n).map(i => (i, i * 10L, s"u${i % 4}"))
      .toDF("id", "score", "user").coalesce(1), t, statsCols = Seq("id"))
    SnapshotStore.setDvEnabled(spark, t, enabled = true)
  }

  private def live(t: String) = SnapshotStore.state(spark, t).live

  test("merge-on-read delete: one commit, zero rewritten files, exact reads everywhere") {
    useCatalog()
    val t = freshTable("basic")
    seed(t)
    val before = live(t).map(_.path).toSet
    val v = SnapshotStore.delete(spark, t, col("id") <= 5L) // routes MoR
    assert(SnapshotStore.history(spark, t).head._2 === "delete_dv")
    assert(live(t).map(_.path).toSet === before,
      "merge-on-read delete must not add or remove data files")
    assert(live(t).exists(_.dv.isDefined), "a dv pointer must be attached")
    assert(live(t).map(_.visibleRows).sum === 15L)
    // programmatic read
    assert(SnapshotStore.snapshot(spark, t).agg(count(lit(1))).head.getLong(0) === 15L)
    assert(SnapshotStore.snapshot(spark, t).agg(min(col("id"))).head.getLong(0) === 6L)
    // SQL catalog read (analyzer rewrite) — including an aggregate
    assert(spark.sql(s"SELECT count(*) FROM graft.`$t`").head.getLong(0) === 15L)
    assert(spark.sql(s"SELECT sum(score) FROM graft.`$t`").head.getLong(0) ===
      (6L to 20L).map(_ * 10L).sum)
    // format read
    assert(spark.read.format("graft.sources.v2.SnapshotDataSource").load(t)
      .count() === 15L)
    // time travel: the pre-delete version still sees every row
    assert(SnapshotStore.snapshot(spark, t, Some(v - 2)).count() === 20L)
    assert(spark.read.format("graft.sources.v2.SnapshotDataSource")
      .option("versionAsOf", v - 2).load(t).count() === 20L)
  }

  test("deletes accumulate: pointers advance, dv datasets stay immutable") {
    val t = freshTable("accum")
    seed(t)
    SnapshotStore.delete(spark, t, col("id") <= 4L)
    val ptr1 = live(t).flatMap(_.dv.map(_._1)).distinct
    SnapshotStore.delete(spark, t, col("id") === 5L) // overlaps the first file
    val movedPtrs = live(t).flatMap(_.dv.map(_._1)).distinct
    assert(movedPtrs.exists(!ptr1.contains(_)),
      "a re-deleted file must point at a NEW dv dataset (old data immutable)")
    assert(SnapshotStore.snapshot(spark, t).orderBy("id")
      .select("id").as[Long].collect().toSeq === (6L to 20L))
    assert(live(t).map(_.visibleRows).sum === 15L)
    // each historical version reads its own pointer
    val vs = SnapshotStore.versions(spark, t)
    assert(SnapshotStore.snapshot(spark, t, Some(vs(vs.size - 2))).count() === 16L)
  }

  test("restore rolls a merge-on-read delete back; resurrected rows flow as CDF inserts") {
    val t = freshTable("restore")
    seed(t)
    val v0 = SnapshotStore.latestVersion(spark, t) // dv enabled, all 20 visible
    SnapshotStore.delete(spark, t, col("id") <= 8L)
    val vDel = SnapshotStore.latestVersion(spark, t)
    assert(SnapshotStore.snapshot(spark, t).count() === 12L)
    val vRes = SnapshotStore.restore(spark, t, v0)
    assert(vRes > vDel)
    assert(SnapshotStore.snapshot(spark, t).count() === 20L,
      "restore must roll the dv pointer back")
    // change feed across the delete and the restore: 8 deletes then 8
    // resurrection inserts, position-exact
    val feed = SnapshotStore.changes(spark, t, v0)
    val dels = feed.filter(col("_change_type") === "delete")
      .select("id").as[Long].collect().sorted.toSeq
    val ins = feed.filter(col("_change_type") === "insert")
      .select("id").as[Long].collect().sorted.toSeq
    assert(dels === (1L to 8L), s"dv delete rows must flow as deletes: $dels")
    assert(ins === (1L to 8L), s"restored rows must flow as inserts: $ins")
    assert(feed.filter(col("_commit_version") === vDel)
      .filter(col("_change_type") === "insert").count() === 0L,
      "a delete_dv commit must not emit inserts")
  }

  test("change feed: delete_dv emits exactly the deleted rows; purge emits nothing") {
    val t = freshTable("cdf")
    seed(t)
    val v0 = SnapshotStore.latestVersion(spark, t)
    SnapshotStore.delete(spark, t, col("user") === "u1") // ids 1,5,9,13,17
    SnapshotStore.delete(spark, t, col("id") === 2L)
    val feed = SnapshotStore.changes(spark, t, v0)
    assert(feed.filter(col("_change_type") === "delete")
      .select("id").as[Long].collect().sorted.toSeq ===
      Seq(1L, 2L, 5L, 9L, 13L, 17L))
    assert(feed.filter(col("_change_type") === "insert").count() === 0L)
    val vBeforePurge = SnapshotStore.latestVersion(spark, t)
    SnapshotStore.purgeDv(spark, t)
    assert(SnapshotStore.changes(spark, t, vBeforePurge).count() === 0L,
      "purge is content-preserving — the feed must emit nothing")
  }

  test("purge rewrites dv'd files clean; vacuum then reclaims the dv datasets") {
    val t = freshTable("purge")
    seed(t)
    SnapshotStore.delete(spark, t, col("id") % 2L === 0L)
    assert(live(t).exists(_.dv.isDefined))
    val visible = SnapshotStore.snapshot(spark, t).orderBy("id")
      .select("id").as[Long].collect().toSeq
    SnapshotStore.purgeDv(spark, t)
    assert(live(t).forall(_.dv.isEmpty), "purge must drop every pointer")
    assert(SnapshotStore.snapshot(spark, t).orderBy("id")
      .select("id").as[Long].collect().toSeq === visible,
      "purge must preserve visible rows exactly")
    // retention collapsed to the head version: the dv dirs are now
    // unreferenced and vacuum reclaims them
    val dvRoot = new java.io.File(new java.net.URI(s"$t/dv"))
    assert(dvRoot.exists() && dvRoot.listFiles().nonEmpty)
    val r = SnapshotStore.vacuumReport(spark, t, retainVersions = 1, graceMs = 0L)
    assert(dvRoot.listFiles() == null || dvRoot.listFiles().isEmpty,
      s"vacuum must reclaim unreferenced dv datasets (deleted ${r.files})")
    // and a retained dv survives: new delete, vacuum with retention
    SnapshotStore.delete(spark, t, col("id") === 3L)
    SnapshotStore.vacuumReport(spark, t, retainVersions = 1, graceMs = 0L)
    assert(SnapshotStore.snapshot(spark, t).count() === visible.size - 1L,
      "vacuum must never reclaim a dv a retained version points at")
  }

  test("copy-on-write interop: UPDATE/MERGE/compaction apply the dv and never resurrect") {
    useCatalog()
    val t = freshTable("cow")
    seed(t)
    SnapshotStore.delete(spark, t, col("id") <= 10L)
    // flip MoR OFF so the UPDATE takes the copy-on-write path OVER the
    // dv'd files — the rewrite must apply the vector, not resurrect
    SnapshotStore.setDvEnabled(spark, t, enabled = false)
    spark.sql(s"UPDATE graft.`$t` SET score = score + 1 WHERE id = 15")
    assert(SnapshotStore.history(spark, t).head._2 === "update",
      "with the property off the UPDATE must be copy-on-write")
    val after = SnapshotStore.snapshot(spark, t)
    assert(after.count() === 10L)
    assert(after.filter(col("id") === 15L).select("score").head.getLong(0) === 151L)
    assert(after.filter(col("id") <= 10L).count() === 0L,
      "a copy-on-write rewrite must not resurrect dv-deleted rows")
    // compaction purifies: pointers drop, visible rows carry
    SnapshotStore.compact(spark, t, targetFiles = 1)
    assert(live(t).forall(_.dv.isEmpty))
    assert(SnapshotStore.snapshot(spark, t).count() === 10L)
  }

  test("optimistic concurrency: a rewrite computed before a racing dv loses loudly") {
    val t = freshTable("race")
    seed(t)
    val snap = SnapshotStore.state(spark, t)
    val stale = SnapshotStore.readLive(spark, snap.meta, snap.live)
    // a merge-on-read delete lands while the rewrite is in flight
    SnapshotStore.delete(spark, t, col("id") === 7L)
    val ex = intercept[java.util.ConcurrentModificationException] {
      SnapshotStore.commitRewrite(spark, t, stale,
        removes = snap.live.map(_.path), op = "compact",
        statsCols = Seq("id"),
        expectDv = snap.live.map(a => a.path -> a.dv).toMap)
    }
    assert(ex.getMessage.contains("deletion vector"))
    // and the mechanism is live in the real verbs: compact now succeeds
    // because it re-reads state, seeing the dv
    SnapshotStore.compact(spark, t, targetFiles = 1)
    assert(SnapshotStore.snapshot(spark, t).count() === 19L)
  }

  test("SQL surface: CALL enable_dv / purge_dv; clone carries pointers; MoR delete via SQL") {
    useCatalog()
    val b = "file:" + java.nio.file.Files
      .createTempDirectory("graft-dv-sql").toString
    val t = s"$b/src"
    SnapshotStore.append((1L to 12L).map(i => (i, i * 10L)).toDF("id", "score"),
      t, statsCols = Seq("id"))
    spark.sql(s"CALL graft.enable_dv('$t')").collect()
    val before = live(t).map(_.path).toSet
    spark.sql(s"DELETE FROM graft.`$t` WHERE id > 9")
    assert(live(t).map(_.path).toSet === before, "SQL DELETE must go merge-on-read")
    assert(spark.sql(s"SELECT count(*) FROM graft.`$t`").head.getLong(0) === 9L)
    // a shallow clone references the source's dv pointers byte-for-byte
    val c = s"$b/clone"
    SnapshotStore.shallowClone(spark, t, c)
    assert(SnapshotStore.snapshot(spark, c).count() === 9L)
    assert(live(c).exists(_.dv.isDefined))
    // purge via CALL: pointers gone, rows stable
    val row = spark.sql(s"CALL graft.purge_dv('$t')").head
    assert(row.getInt(1) === 0, "no dv'd files may remain after purge")
    assert(spark.sql(s"SELECT count(*) FROM graft.`$t`").head.getLong(0) === 9L)
    // the clone still reads through ITS pointer (source purge moved
    // nothing it references — dv datasets are immutable)
    assert(SnapshotStore.snapshot(spark, c).count() === 9L)
  }

  test("merge-on-read UPDATE: matched rows mask + re-land; files untouched") {
    useCatalog()
    val t = freshTable("morupd")
    seed(t)
    val before = live(t).map(_.path).toSet
    spark.sql(s"UPDATE graft.`$t` SET score = score + 1000 WHERE id <= 3")
    assert(SnapshotStore.history(spark, t).head._2 === "update_dv")
    assert(before.subsetOf(live(t).map(_.path).toSet),
      "merge-on-read update must keep every original file live")
    assert(live(t).map(_.path).toSet.size === before.size + 1,
      "the updated rows land as ONE fresh file")
    val snap = SnapshotStore.snapshot(spark, t)
    assert(snap.count() === 20L, "row count must be stable across MoR update")
    assert(snap.filter(col("id") <= 3L).orderBy("id")
      .select("score").as[Long].collect().toSeq === Seq(1010L, 1020L, 1030L))
    assert(snap.filter(col("id") === 4L).select("score").head.getLong(0) === 40L)
    // CDF: the update flows as position-delta deletes + fresh-file inserts
    val v = SnapshotStore.latestVersion(spark, t)
    val feed = SnapshotStore.changes(spark, t, v - 1)
    assert(feed.filter(col("_change_type") === "delete")
      .select("id").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
    assert(feed.filter(col("_change_type") === "insert")
      .select("score").as[Long].collect().sorted.toSeq === Seq(1010L, 1020L, 1030L))
  }

  test("merge-on-read MERGE: keep rows stay in place, updates mask, inserts land") {
    useCatalog()
    val t = freshTable("mormerge")
    seed(t) // ids 1..20
    val before = live(t).map(_.path).toSet
    Seq((2L, 222L), (19L, 999L), (42L, 4242L))
      .toDF("id", "newscore").createOrReplaceTempView("mor_src")
    spark.sql(
      s"""MERGE INTO graft.`$t` tgt USING mor_src s ON tgt.id = s.id
         |WHEN MATCHED AND s.id < 10 THEN UPDATE SET score = s.newscore
         |WHEN MATCHED THEN DELETE
         |WHEN NOT MATCHED THEN INSERT (id, score, user)
         |  VALUES (s.id, s.newscore, 'new')""".stripMargin)
    assert(SnapshotStore.history(spark, t).head._2 === "merge_dv")
    assert(before.subsetOf(live(t).map(_.path).toSet),
      "merge-on-read merge must keep every original file live")
    val snap = SnapshotStore.snapshot(spark, t)
    assert(snap.count() === 20L) // 20 - delete(19) + insert(42)
    assert(snap.filter(col("id") === 2L).select("score").head.getLong(0) === 222L)
    assert(snap.filter(col("id") === 19L).count() === 0L, "MATCHED DELETE must mask")
    assert(snap.filter(col("id") === 42L).select("user").head.getString(0) === "new")
    assert(snap.filter(col("id") === 5L).select("score").head.getLong(0) === 50L,
      "keep rows must carry byte-identical")
    // a second MoR merge accumulates onto the same files (pointer advance)
    Seq((3L, 333L)).toDF("id", "newscore").createOrReplaceTempView("mor_src2")
    spark.sql(
      s"""MERGE INTO graft.`$t` tgt USING mor_src2 s ON tgt.id = s.id
         |WHEN MATCHED THEN UPDATE SET score = s.newscore""".stripMargin)
    val snap2 = SnapshotStore.snapshot(spark, t)
    assert(snap2.count() === 20L)
    assert(snap2.filter(col("id") === 3L).select("score").head.getLong(0) === 333L)
    assert(snap2.filter(col("id") === 2L).select("score").head.getLong(0) === 222L)
  }

  test("the three dv oracle queries match their own oracle SQL at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    graft.sources.Tables.documents(spark, sf).createOrReplaceTempView("documents")
    Seq("q_snapshot_delete_dv", "q_snapshot_dv_purge", "q_snapshot_dv_cdf")
      .foreach { name =>
        val got = graft.SparkEntry.queries(name)(spark, sf)
        val want = spark.sql(graft.SparkEntry.oracleSql(name))
        assert(got.schema.fieldNames.sorted.toSeq ===
          want.schema.fieldNames.sorted.toSeq, name)
        val g = got.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
        val w = want.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
        assert(g.length === w.length, s"$name rows")
        assert(g.toSeq === w.toSeq, s"$name values")
      }
  }

  test("count(*) on a dv'd table answers from the log — no file scan") {
    useCatalog()
    val t = freshTable("cnt")
    seed(t)
    SnapshotStore.delete(spark, t, col("id") <= 5L)
    val df = spark.sql(s"SELECT count(*) AS n FROM graft.`$t`")
    assert(df.head.getLong(0) === 15L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"),
      s"dv count(*) must collapse to the log answer:\n$plan")
    assert(!plan.toLowerCase.contains("parquet"),
      s"dv count(*) must not plan a file scan:\n$plan")
    // count(col) stays a (correct) scan — dv positions carry no nullness
    assert(spark.sql(s"SELECT count(user) FROM graft.`$t`").head.getLong(0) === 15L)
  }

  test("write amplification: MoR delete writes a small fraction of CoW's bytes") {
    // same corpus, same delete, two strategies — the merge-on-read
    // write is the dv dataset alone (positions), the copy-on-write one
    // re-lands every kept byte of the touched files
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"), col("text"), col("lang"))
    val b = "file:" + java.nio.file.Files
      .createTempDirectory("graft-dv-amp").toString
    def dirBytes(d: String): Long = {
      val f = new java.io.File(new java.net.URI(d))
      if (!f.exists()) 0L
      else f.listFiles().filter(_.isFile).map(_.length()).sum
    }
    val cow = s"$b/cow"; val mor = s"$b/mor"
    SnapshotStore.append(docs.coalesce(2), cow, statsCols = Seq("doc_id"))
    SnapshotStore.append(docs.coalesce(2), mor, statsCols = Seq("doc_id"))
    SnapshotStore.setDvEnabled(spark, mor, enabled = true)
    val cowBefore = dirBytes(s"$cow/data")
    SnapshotStore.delete(spark, cow, col("doc_id") % 50L === 0L) // ~2% of rows
    val cowWritten = dirBytes(s"$cow/data") - cowBefore + 0L // rewrite not yet vacuumed
    val morBefore = dirBytes(s"$mor/data")
    SnapshotStore.delete(spark, mor, col("doc_id") % 50L === 0L)
    val morDataWritten = dirBytes(s"$mor/data") - morBefore
    val morDvWritten = dirBytes(s"$mor/dv/" +
      new java.io.File(new java.net.URI(s"$mor/dv")).listFiles().head.getName)
    assert(morDataWritten === 0L, "merge-on-read must write no data files")
    assert(cowWritten > 0L, "copy-on-write must stage rewrites")
    assert(morDvWritten * 10 < cowWritten,
      s"the dv write ($morDvWritten B) must be a small fraction of the " +
        s"CoW rewrite ($cowWritten B)")
    // and the two strategies agree on the result
    assert(SnapshotStore.snapshot(spark, cow).count() ===
      SnapshotStore.snapshot(spark, mor).count())
  }

  test("dv composes with column mapping and schema evolution") {
    useCatalog()
    val t = freshTable("mapping")
    seed(t)
    // rename BEFORE the delete: files carry the old physical name, the
    // dv masks positions regardless of labels
    SnapshotStore.renameColumn(spark, t, "score", "points")
    SnapshotStore.delete(spark, t, col("points") <= 30L) // ids 1..3
    assert(SnapshotStore.snapshot(spark, t).orderBy("id")
      .select("points").as[Long].collect().headOption === Some(40L))
    assert(spark.sql(s"SELECT count(*) FROM graft.`$t`").head.getLong(0) === 17L,
      "the DV rewrite must read through the column mapping")
    // widen AFTER the delete: old files null-fill the new column, the
    // dv still masks
    spark.sql(s"ALTER TABLE graft.`$t` ADD COLUMNS (note STRING)")
    val out = spark.sql(
      s"SELECT count(*) AS n, count(note) AS notes FROM graft.`$t`").head
    assert(out.getLong(0) === 17L && out.getLong(1) === 0L)
    // and a post-evolution MoR delete keyed on the RENAMED column
    SnapshotStore.delete(spark, t, col("points") > 190L) // ids 20
    assert(SnapshotStore.snapshot(spark, t).count() === 16L)
    // purge under mapping: rewrite stays mapping-safe (stageFiles
    // renames through the live mapping)
    SnapshotStore.purgeDv(spark, t)
    assert(SnapshotStore.snapshot(spark, t).orderBy("id")
      .select("points").as[Long].collect().toSeq === (4L to 19L).map(_ * 10L))
  }

  test("read positions: INSERT query side, IN-subquery, and MERGE source see the dv") {
    useCatalog()
    val b = "file:" + java.nio.file.Files
      .createTempDirectory("graft-dv-pos").toString
    val src = s"$b/src"
    seed(src, n = 10L)
    SnapshotStore.delete(spark, src, col("id") <= 4L) // visible: 5..10
    // INSERT INTO ... SELECT FROM the dv'd table: the WRITE command's
    // query side must read dv-filtered (V2WriteCommand.withNewQuery leg)
    val dst = s"$b/dst"
    SnapshotStore.append(Seq((0L, 0L, "seedrow")).toDF("id", "score", "user"),
      dst, statsCols = Seq("id"))
    spark.sql(s"INSERT INTO graft.`$dst` SELECT * FROM graft.`$src`")
    assert(SnapshotStore.snapshot(spark, dst).count() === 7L,
      "insert-select must not copy dv-deleted rows")
    // IN (SELECT ...) over the dv'd table (SubqueryExpression leg)
    val n = spark.sql(
      s"SELECT count(*) FROM graft.`$dst` WHERE id IN (SELECT id FROM graft.`$src`)")
      .head.getLong(0)
    assert(n === 6L, "the IN-subquery must see only visible rows")
    // MERGE with the dv'd table as SOURCE (RewriteSnapshotMerge captures
    // the source into a leaf command before RewriteDvReads runs — the
    // explicit rewriteReads call in that rule is what this pins)
    val tgt = s"$b/tgt"
    SnapshotStore.append((1L to 10L).map(i => (i, 0L)).toDF("id", "hits"),
      tgt, statsCols = Seq("id"))
    spark.sql(
      s"""MERGE INTO graft.`$tgt` t USING graft.`$src` s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET hits = 1""".stripMargin)
    val hit = SnapshotStore.snapshot(spark, tgt)
      .filter(col("hits") === 1L).select("id").as[Long].collect().sorted.toSeq
    assert(hit === (5L to 10L),
      s"the merge source must be dv-filtered (deleted ids must not match): $hit")
  }

  test("maintain purges dv debt past the ratio, even within the file budget") {
    val t = freshTable("maint")
    seed(t)
    SnapshotStore.delete(spark, t, col("id") <= 12L) // 60% of one file masked
    assert(live(t).exists(_.dv.isDefined))
    // below the ratio: no purge, no compaction (file count within budget)
    assert(SnapshotStore.maintain(spark, t, maxLiveFiles = 100, targetFiles = 1,
      purgeDvAbove = Some(0.9)).isEmpty)
    assert(live(t).exists(_.dv.isDefined))
    // past the ratio: purge commits even though the file count is fine
    val v = SnapshotStore.maintain(spark, t, maxLiveFiles = 100, targetFiles = 1,
      purgeDvAbove = Some(0.5))
    assert(v.isDefined)
    assert(SnapshotStore.history(spark, t).head._2 === "purge_dv")
    assert(live(t).forall(_.dv.isEmpty))
    assert(SnapshotStore.snapshot(spark, t).count() === 8L)
  }

  test("CDF stream mirrors merge-on-read deletes into a downstream table") {
    val t = freshTable("cdfstream")
    seed(t, n = 8L)
    SnapshotStore.delete(spark, t, col("id") <= 2L)
    val out = "file:" + java.nio.file.Files
      .createTempDirectory("graft-dvcdf-sink").toString
    val cp = java.nio.file.Files.createTempDirectory("graft-dvcdf-cp").toString
    val q = spark.readStream.format("graft.sources.v2.SnapshotDataSource")
      .option("readChangeFeed", "true")
      .load(t)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp)
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(out)
    // initial snapshot arrives as inserts of the VISIBLE rows only
    assert(got.filter(col("_change_type") === "insert")
      .select("id").as[Long].collect().sorted.toSeq === (3L to 8L))
    // a later MoR delete flows as position-delta deletes on restart
    SnapshotStore.delete(spark, t, col("id") === 5L)
    val q2 = spark.readStream.format("graft.sources.v2.SnapshotDataSource")
      .option("readChangeFeed", "true")
      .load(t)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp)
      .start()
    try q2.processAllAvailable() finally q2.stop()
    val dels = spark.read.parquet(out).filter(col("_change_type") === "delete")
    assert(dels.select("id").as[Long].collect().toSeq === Seq(5L),
      "the second batch must carry exactly the masked position as a delete")
  }

  test("streaming initial load of a dv'd table excludes deleted rows") {
    val t = freshTable("stream")
    seed(t, n = 10L)
    SnapshotStore.delete(spark, t, col("id") <= 3L)
    val out = "file:" + java.nio.file.Files
      .createTempDirectory("graft-dv-sink").toString
    val cp = java.nio.file.Files.createTempDirectory("graft-dv-cp").toString
    val q = spark.readStream.format("graft.sources.v2.SnapshotDataSource")
      .load(t)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp)
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.read.parquet(out).select("id").as[Long].collect().sorted.toSeq
      === (4L to 10L), "the stream's initial snapshot must apply the dv")
  }
}
