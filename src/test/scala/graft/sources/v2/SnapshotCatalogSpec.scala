package graft.sources.v2

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.SnapshotStore

/** The catalog-qualified SQL surface over SnapshotStore: SELECT with
  * VERSION AS OF, INSERT INTO / INSERT OVERWRITE through the commit
  * protocol, CTAS bootstrap, DROP, and the read-only past.
  */
class SnapshotCatalogSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  spark.conf.set("spark.sql.catalog.graft", classOf[SnapshotCatalog].getName)

  private def freshTable(tag: String): String =
    "file:" + java.nio.file.Files
      .createTempDirectory(s"graft-cat-$tag").toString + "/t"

  test("SELECT + VERSION AS OF resolve through the catalog") {
    val t = freshTable("read")
    SnapshotStore.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t) // v1
    SnapshotStore.overwrite(Seq((30L, "c")).toDF("id", "v"), t)       // v2
    assert(spark.sql(s"SELECT sum(id) FROM graft.`$t`").as[Long].head === 30L)
    assert(spark.sql(s"SELECT sum(id) FROM graft.`$t` VERSION AS OF 1")
      .as[Long].head === 3L)
    // the scan is the delegated DSv2 parquet read, not some side channel
    val plan = spark.sql(s"SELECT id FROM graft.`$t`").queryExecution.executedPlan
    assert(collectFirst(plan) { case b: BatchScanExec => b }.nonEmpty)
  }

  test("TIMESTAMP AS OF resolves through the catalog to the version live at that instant") {
    val t = freshTable("tsread")
    SnapshotStore.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t) // v1
    Thread.sleep(15)
    val mid = System.currentTimeMillis()
    Thread.sleep(15)
    SnapshotStore.overwrite(Seq((30L, "c")).toDF("id", "v"), t)       // v2
    // timestamp_millis() sidesteps session-timezone string parsing: the
    // literal IS the instant versionAt compares commit `ts` meta against
    assert(spark.sql(
      s"SELECT sum(id) FROM graft.`$t` TIMESTAMP AS OF timestamp_millis($mid)")
      .as[Long].head === 3L, "the pre-overwrite snapshot answers")
    assert(spark.sql(
      s"SELECT sum(id) FROM graft.`$t` TIMESTAMP AS OF " +
        s"timestamp_millis(${System.currentTimeMillis()})")
      .as[Long].head === 30L)
    val err = intercept[Exception] {
      spark.sql(
        s"SELECT * FROM graft.`$t` TIMESTAMP AS OF timestamp_millis(${mid - 60000})")
        .collect()
    }
    assert(err.getMessage.contains("predates"),
      s"pre-creation time travel must fail loudly, got: ${err.getMessage}")
  }

  test("INSERT INTO appends a commit; INSERT OVERWRITE replaces atomically") {
    val t = freshTable("write")
    SnapshotStore.append(Seq((1L, "a")).toDF("id", "v"), t)
    spark.sql(s"INSERT INTO graft.`$t` VALUES (2, 'b'), (3, 'c')")
    assert(spark.sql(s"SELECT count(*) FROM graft.`$t`").as[Long].head === 3L)
    assert(SnapshotStore.history(spark, t).head._2 === "append")
    spark.sql(s"INSERT OVERWRITE graft.`$t` VALUES (9, 'z')")
    assert(spark.sql(s"SELECT id FROM graft.`$t`").as[Long].collect().toSeq === Seq(9L))
    assert(SnapshotStore.history(spark, t).head._2 === "overwrite")
    // pre-overwrite versions stay readable: nothing bypassed the log
    assert(spark.sql(s"SELECT count(*) FROM graft.`$t` VERSION AS OF 2")
      .as[Long].head === 3L)
  }

  test("CTAS bootstraps a table; DROP TABLE removes it physically") {
    val t = freshTable("ctas")
    spark.sql(s"CREATE TABLE graft.`$t` AS SELECT * FROM VALUES (1, 'x'), (2, 'y') AS v(id, s)")
    assert(spark.sql(s"SELECT count(*) FROM graft.`$t`").as[Long].head === 2L)
    assert(SnapshotStore.latestVersion(spark, t) === 1L)
    spark.sql(s"DROP TABLE graft.`$t`")
    val e = intercept[Exception](spark.sql(s"SELECT * FROM graft.`$t`").collect())
    assert(e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND")
      || e.getMessage.toLowerCase.contains("not found"))
  }

  test("version-pinned reads are read-only at capability level") {
    val t = freshTable("pin")
    SnapshotStore.append(Seq((1L, "a")).toDF("id", "v"), t)
    SnapshotStore.append(Seq((2L, "b")).toDF("id", "v"), t)
    val pinned = new SnapshotCatalogTable(t, asOf = Some(1L), declaredSchema = None)
    assert(!pinned.capabilities().contains(
      org.apache.spark.sql.connector.catalog.TableCapability.V1_BATCH_WRITE))
  }

  test("namespaces and unsupported DDL are rejected loudly") {
    val t = freshTable("err")
    SnapshotStore.append(Seq((1L, "a")).toDF("id", "v"), t)
    val ns = intercept[Exception](
      spark.sql(s"SELECT * FROM graft.db.`$t`").collect())
    assert(ns.getMessage.contains("path-addressed")
      || ns.getMessage.toLowerCase.contains("not found"))
    val ts = intercept[Exception](
      spark.sql(s"SELECT * FROM graft.`$t` TIMESTAMP AS OF '2000-01-01'").collect())
    assert(ts.getMessage.contains("predates"),
      s"pre-creation TIMESTAMP AS OF must fail loudly: ${ts.getMessage}")
  }

  test("SQL DELETE FROM runs the copy-on-write delete through the catalog") {
    val t = freshTable("del")
    SnapshotStore.append(
      Seq((1L, "keep"), (2L, "drop"), (3L, "keep")).toDF("id", "v"), t)
    spark.sql(s"DELETE FROM graft.`$t` WHERE v = 'drop' OR id > 2")
    assert(spark.sql(s"SELECT id FROM graft.`$t` ORDER BY id")
      .as[Long].collect().toSeq === Seq(1L))
    assert(SnapshotStore.history(spark, t).head._2 === "delete")
    // the delete is a commit like any other: the pre-delete version reads
    assert(spark.sql(s"SELECT count(*) FROM graft.`$t` VERSION AS OF 1")
      .as[Long].head === 3L)
  }

  test("INSERT INTO ... REPLACE WHERE swaps exactly the matching slice in one commit") {
    val t = freshTable("replace")
    SnapshotStore.append((1L to 5L).map(i => (i, "day1")).toDF("id", "day")
      .coalesce(1), t, statsCols = Seq("id"))
    SnapshotStore.append((6L to 9L).map(i => (i, "day2")).toDF("id", "day")
      .coalesce(1), t, statsCols = Seq("id"))
    val before = SnapshotStore.state(spark, t).live.map(_.path).toSet
    // idempotent re-load of day2: replace the slice, leave day1 alone
    spark.sql(s"INSERT INTO graft.`$t` REPLACE WHERE day = 'day2' " +
      "SELECT id, 'day2' AS day FROM range(6, 12)")
    val after = SnapshotStore.state(spark, t)
    assert((before & after.live.map(_.path).toSet).size === 1,
      "the day1 file must survive by path")
    assert(after.live.forall(_.stats.contains("id")),
      "replace re-harvests the table's tracked stats")
    val rows = SnapshotStore.snapshot(spark, t)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(rows === ((1L to 5L).map((_, "day1")) ++ (6L to 11L).map((_, "day2"))))
    assert(SnapshotStore.history(spark, t).head._2 === "replace_where")
    // one commit: a reader at any version sees day2 whole or replaced,
    // never missing
    assert(SnapshotStore.latestVersion(spark, t) === 3L)
  }

  test("REPLACE WHERE enforces its constraint: out-of-slice input rows fail loudly") {
    val t = freshTable("replace-constraint")
    SnapshotStore.append((1L to 5L).map(i => (i, "day1")).toDF("id", "day"), t,
      statsCols = Seq("id"))
    // a mis-filtered re-load: one row claims day1 while replacing day2 —
    // landing it would duplicate the day1 rows the call did not replace
    val err = intercept[Exception] {
      spark.sql(s"INSERT INTO graft.`$t` REPLACE WHERE day = 'day2' " +
        "SELECT id, CASE WHEN id = 7 THEN 'day1' ELSE 'day2' END AS day " +
        "FROM range(6, 10)")
    }
    assert(err.getMessage.contains("replaceWhere") ||
      Option(err.getCause).exists(_.getMessage.contains("replaceWhere")),
      s"got: $err")
    // nothing committed; NULL-condition rows are outside the slice too
    assert(SnapshotStore.latestVersion(spark, t) === 1L)
    val errNull = intercept[Exception] {
      SnapshotStore.replaceWhere(
        Seq((6L, null.asInstanceOf[String])).toDF("id", "day"), t,
        col("day") === "day2")
    }
    assert(errNull.getMessage.contains("replaceWhere"), s"got: $errNull")
    assert(SnapshotStore.latestVersion(spark, t) === 1L)
    // the constraint probe and the staged write are TWO passes over the
    // input — a non-deterministic input plan (here: row membership
    // picked by an unordered LIMIT) could pass the probe with one row
    // set and land another, so it must be refused up front like the
    // MERGE source guard does
    val errNd = intercept[Exception] {
      SnapshotStore.replaceWhere(
        (6L to 9L).map(i => (i, "day2")).toDF("id", "day").limit(2), t,
        col("day") === "day2")
    }
    assert(errNd.getMessage.contains("deterministic"), s"got: $errNd")
    assert(SnapshotStore.latestVersion(spark, t) === 1L)
    // the deterministic ordered form of the same input commits fine
    SnapshotStore.replaceWhere(
      (6L to 9L).map(i => (i, "day2")).toDF("id", "day")
        .orderBy(col("id")).limit(2), t,
      col("day") === "day2")
    assert(SnapshotStore.latestVersion(spark, t) === 2L)
  }

  test("ALTER TABLE ADD COLUMNS duplicate check honors case-insensitive analysis") {
    val t = freshTable("alter-ci")
    SnapshotStore.append(Seq((1L, "en")).toDF("id", "lang"), t)
    // `Lang` duplicates `lang` under default case-insensitive analysis —
    // committing it would make every later read/DML ambiguous
    val err = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$t` ADD COLUMNS (Lang STRING)") }
    assert(err.getMessage.contains("already exists"), s"got: ${err.getMessage}")
    // two same-name adds in one statement are refused too
    val err2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$t` ADD COLUMNS (x BIGINT, X STRING)") }
    assert(err2.getMessage.contains("twice") ||
      err2.getMessage.contains("already exists"), s"got: ${err2.getMessage}")
    assert(SnapshotStore.latestVersion(spark, t) === 1L, "no schema commit landed")
  }

  test("ALTER TABLE ADD COLUMNS: metadata-only widening, old rows null-fill") {
    val t = freshTable("alter")
    SnapshotStore.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t)
    val filesBefore = SnapshotStore.state(spark, t).live.map(_.path).toSet
    spark.sql(s"ALTER TABLE graft.`$t` ADD COLUMNS (score BIGINT, tag STRING)")
    // metadata-only: ONE new commit, ZERO data movement
    assert(SnapshotStore.latestVersion(spark, t) === 2L)
    assert(SnapshotStore.state(spark, t).live.map(_.path).toSet === filesBefore)
    assert(SnapshotStore.history(spark, t).head._2 === "alter_schema")
    // old rows read the new columns as null
    val rows = spark.sql(s"SELECT id, v, score, tag FROM graft.`$t` ORDER BY id")
      .collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(rows.forall(r => r.isNullAt(2) && r.isNullAt(3)))
    // inserts with the widened layout land normally
    spark.sql(s"INSERT INTO graft.`$t` VALUES (3, 'c', 30, 'x')")
    assert(spark.sql(s"SELECT score FROM graft.`$t` WHERE id = 3")
      .as[Long].head() === 30L)
    // time travel still sees the era's schema (v1: two columns)
    assert(spark.sql(s"SELECT * FROM graft.`$t` VERSION AS OF 1").columns.toSeq
      === Seq("id", "v"))
    // duplicates and type changes are refused (RENAME/DROP are now
    // supported via column mapping — ColumnMappingSpec covers them)
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$t` ADD COLUMNS (id BIGINT)") }
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$t` ALTER COLUMN score TYPE INT") }
  }

  test("CALL procedures: optimize / optimize-zordered / vacuum / restore as SQL") {
    val t = freshTable("proc")
    (0 until 6).foreach { i =>
      SnapshotStore.append(
        (0 until 64).map(j => (j.toLong, ((j * 37 + i) % 64).toLong)).toDF("x", "y")
          .coalesce(1), t, statsCols = Seq("x", "y"))
    }
    assert(SnapshotStore.state(spark, t).live.size === 6)
    // OPTIMIZE: metadata-swap compaction, one summary row
    val opt = spark.sql(s"CALL graft.optimize('$t', 2)").collect().head
    assert(opt.getAs[Long]("version") === 7L)
    assert(opt.getAs[Int]("files_before") === 6)
    assert(opt.getAs[Int]("files_after") <= 2)
    assert(SnapshotStore.snapshot(spark, t).count() === 6L * 64)
    // Z-ORDERED optimize: fragmented appends again, then the clustered
    // rewrite makes a small box prune files
    (0 until 4).foreach { i =>
      SnapshotStore.append(
        (0 until 64).map(j => (j.toLong, ((j * 37 + i) % 64).toLong)).toDF("x", "y")
          .coalesce(1), t, statsCols = Seq("x", "y"))
    }
    spark.sql(s"CALL graft.optimize('$t', 4, 'x,y')")
    val (kept, total) = SnapshotStore.prunedLiveFiles(spark, t,
      Map("x" -> (0L, 7L), "y" -> (0L, 7L)))
    assert(total === 4 && kept.size < total,
      s"z-ordered CALL optimize must restore box pruning: $kept of $total")
    // VACUUM: the compacted-away fragments become deletable
    val deleted = spark.sql(s"CALL graft.vacuum('$t', 1)").collect()
      .head.getAs[Int]("deleted_files")
    assert(deleted >= 6, s"pre-compaction fragments must vacuum, got $deleted")
    // RESTORE is refused the vacuumed past but works for live versions
    val restored = spark.sql(
      s"CALL graft.restore('$t', ${SnapshotStore.latestVersion(spark, t)})")
      .collect().head
    assert(restored.getAs[Long]("new_version") ===
      SnapshotStore.latestVersion(spark, t))
    // unknown procedure: loud
    intercept[Exception] { spark.sql(s"CALL graft.no_such_proc('$t')") }
  }

  test("CALL graft.dedup_sink_maintain compacts a sink's stores clustered by their pruning keys") {
    val dir = "file:" + java.nio.file.Files
      .createTempDirectory("graft-cat-sinkmaint").toString
    // a containment-sink-shaped store: many small per-batch commits
    (1 to 6).foreach { i =>
      val sigs = Seq((i.toLong, Seq(i * 10L, i * 10L + 1), 2L))
        .toDF("doc_id", "hs", "n_sh").coalesce(1)
      SnapshotStore.append(sigs, s"$dir/sigs",
        statsCols = Seq("doc_id"), bloomCols = Seq("doc_id"))
      SnapshotStore.append(
        sigs.select(col("doc_id"), explode(col("hs")).as("h")).coalesce(1),
        s"$dir/postings", statsCols = Seq("h", "doc_id"),
        bloomCols = Seq("doc_id", "h"))
      SnapshotStore.append(
        Seq((i.toLong, true)).toDF("doc_id", "keep").coalesce(1),
        s"$dir/verdicts", statsCols = Seq("doc_id"), bloomCols = Seq("doc_id"))
    }
    val row = spark.sql(s"CALL graft.dedup_sink_maintain('$dir', 'doc_id', 1)")
      .collect().head
    // only the stores that EXIST compact (no bands/vectors here);
    // `stores` is the PRESENT set, `rewritten`/`skipped` split it
    assert(row.getAs[String]("stores") === "sigs,postings,verdicts")
    assert(row.getAs[String]("rewritten") === "sigs,postings,verdicts")
    assert(row.getAs[String]("skipped") === "")
    assert(row.getAs[Int]("files_before") === 18)
    assert(row.getAs[Int]("files_after") === 3)
    // contents invariant, layout clustered: a point probe on the
    // postings' pruning key now reads a bounded slice
    assert(SnapshotStore.snapshot(spark, s"$dir/sigs").count() === 6L)
    assert(SnapshotStore.rowCount(spark, s"$dir/postings") === 12L)
    assert(SnapshotStore.snapshot(spark, s"$dir/verdicts")
      .filter(col("keep")).count() === 6L)
    // EARLY-OUT: a second CALL finds every store already at/under the
    // target and rewrites nothing — no version churn; `stores` still
    // reports the present set (an all-skipped run is a successful
    // no-op, distinguishable from "no stores found" which throws)
    val vAfter = SnapshotStore.latestVersion(spark, s"$dir/sigs")
    val again = spark.sql(s"CALL graft.dedup_sink_maintain('$dir', 'doc_id', 1)")
      .collect().head
    assert(again.getAs[String]("stores") === "sigs,postings,verdicts")
    assert(again.getAs[String]("rewritten") === "")
    assert(again.getAs[String]("skipped") === "sigs,postings,verdicts")
    assert(again.getAs[Int]("files_before") === 3)
    assert(again.getAs[Int]("files_after") === 3)
    assert(SnapshotStore.latestVersion(spark, s"$dir/sigs") === vAfter)
    // an empty path fails loudly instead of reporting a no-op
    val ex = intercept[Exception] {
      spark.sql(s"CALL graft.dedup_sink_maintain('$dir/nothing', 'doc_id')")
        .collect()
    }
    assert(ex.getMessage.contains("no dedup-sink store tables"), ex.getMessage)
  }

  test("CALL graft.vacuum: dry_run reports (files, bytes) and deletes nothing; retain_hours honored") {
    val t = freshTable("vacdry")
    SnapshotStore.append(Seq(1L).toDF("id"), t)     // v1
    SnapshotStore.overwrite(Seq(2L).toDF("id"), t)  // v2
    val dry = spark.sql(
      s"CALL graft.vacuum('$t', dry_run => true)").collect().head
    assert(dry.getAs[Int]("deleted_files") === 1
      && dry.getAs[Long]("deleted_bytes") > 0L
      && dry.getAs[Boolean]("dry_run"), s"got: $dry")
    // nothing deleted: the pre-overwrite version still reads
    assert(spark.sql(s"SELECT id FROM graft.`$t` VERSION AS OF 1")
      .as[Long].head === 1L)
    // a generous wall-clock window retains everything (both commits are
    // seconds old) even though retain_versions=1 alone would reclaim v1
    val held = spark.sql(
      s"CALL graft.vacuum('$t', retain_hours => 1.0D, dry_run => true)")
      .collect().head
    assert(held.getAs[Int]("deleted_files") === 0, s"got: $held")
    // the real pass reclaims exactly what the dry run reported
    val real = spark.sql(s"CALL graft.vacuum('$t')").collect().head
    assert(real.getAs[Int]("deleted_files") === 1
      && real.getAs[Long]("deleted_bytes") === dry.getAs[Long]("deleted_bytes")
      && !real.getAs[Boolean]("dry_run"), s"got: $real")
    intercept[Exception] {
      spark.sql(s"SELECT id FROM graft.`$t` VERSION AS OF 1").collect() }
  }

  test("CALL graft.refresh_index: noop when fresh, append on pure inserts, retrain on DML/force/drift") {
    import graft.operators.VectorIndex
    val t = freshTable("vidx")
    val idx = s"$t-ivf"
    def vecs(ids: Seq[Long]) = ids.map { i =>
      (i, Array.tabulate(8)(j => math.sin(i * 17 + j).toFloat))
    }.toDF("vec_id", "embedding")
    SnapshotStore.append(vecs(0L to 19L), t, statsCols = Seq("vec_id"))
    // first CALL trains the pair
    val r1 = spark.sql(s"CALL graft.refresh_index('$t', 'vec_id', " +
      s"'embedding', '$idx', kind => 'ivf', num_centroids => 4)").collect().head
    assert(r1.getAs[String]("action") === "retrain")
    assert(r1.getAs[Long]("source_version") ===
      SnapshotStore.latestVersion(spark, t))
    // fresh → noop, zero writes
    val r2 = spark.sql(s"CALL graft.refresh_index('$t', 'vec_id', " +
      s"'embedding', '$idx', kind => 'ivf', num_centroids => 4)").collect().head
    assert(r2.getAs[String]("action") === "noop")
    assert(r2.getAs[Long]("index_version") === r1.getAs[Long]("index_version"))
    // a small append → O(delta) append
    SnapshotStore.append(vecs(100L to 102L), t)
    val r3 = spark.sql(s"CALL graft.refresh_index('$t', 'vec_id', " +
      s"'embedding', '$idx', kind => 'ivf', num_centroids => 4)").collect().head
    assert(r3.getAs[String]("action") === "append")
    // past the drift fraction → retrain (here: any growth, fraction 0)
    SnapshotStore.append(vecs(200L to 202L), t)
    val r4 = spark.sql(s"CALL graft.refresh_index('$t', 'vec_id', " +
      s"'embedding', '$idx', kind => 'ivf', num_centroids => 4, " +
      "drift_retrain_fraction => CAST(0.0 AS DOUBLE))").collect().head
    assert(r4.getAs[String]("action") === "retrain")
    // force on an unchanged source → retrain
    val r5 = spark.sql(s"CALL graft.refresh_index('$t', 'vec_id', " +
      s"'embedding', '$idx', kind => 'ivf', num_centroids => 4, " +
      "force => true)").collect().head
    assert(r5.getAs[String]("action") === "retrain")
    // the SQ kind follows the same verbs on its single code table
    val sq = s"$t-sq"
    val s1 = spark.sql(s"CALL graft.refresh_index('$t', 'vec_id', " +
      s"'embedding', '$sq')").collect().head
    assert(s1.getAs[String]("action") === "retrain")
    SnapshotStore.append(vecs(300L to 301L), t)
    val s2 = spark.sql(s"CALL graft.refresh_index('$t', 'vec_id', " +
      s"'embedding', '$sq')").collect().head
    assert(s2.getAs[String]("action") === "append")
    assert(SnapshotStore.state(spark, sq).meta(VectorIndex.SourceVersionKey)
      === SnapshotStore.latestVersion(spark, t).toString)
    // the corpus-scaled kind: k = ceil(sqrt(n)) via the scale-safe
    // trainer; same verbs (retrain, then O(delta) append)
    val sc = s"$t-ivfscaled"
    val c1 = spark.sql(s"CALL graft.refresh_index('$t', 'vec_id', " +
      s"'embedding', '$sc', kind => 'ivf_scaled')").collect().head
    assert(c1.getAs[String]("action") === "retrain")
    SnapshotStore.append(vecs(400L to 401L), t)
    val c2 = spark.sql(s"CALL graft.refresh_index('$t', 'vec_id', " +
      s"'embedding', '$sc', kind => 'ivf_scaled')").collect().head
    assert(c2.getAs[String]("action") === "append")
    // bad kind: loud
    intercept[Exception] {
      spark.sql(s"CALL graft.refresh_index('$t', 'vec_id', 'embedding', " +
        s"'$sq', kind => 'pq')").collect() }
  }

  test("CALL graft.refresh_manifest: a landed wave refreshes, the next fleet plan opens zero bags") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft-callrefman").toString
    def land(name: String, n: Int): Unit = Files.write(
      Paths.get(dir, s"$name.bag"),
      graft.plans.BagCodec.pack(
        (0 until n).map(i => ("cam", 1000000L + i, s"m$i".getBytes("UTF-8"))),
        "none", messagesPerChunk = 4))
    land("w1_a", 8)
    val r1 = spark.sql(s"CALL graft.refresh_manifest('$dir')").collect().head
    assert(r1.getAs[Long]("bags") === 1L)
    // a new ingest wave lands; CALL refreshes incrementally
    land("w2_b", 5)
    val r2 = spark.sql(s"CALL graft.refresh_manifest('$dir')").collect().head
    assert(r2.getAs[Long]("bags") === 2L)
    // the refreshed manifest answers the whole fleet plan: zero bag opens
    BagScan.resetPlanProbe()
    val counts = spark.read.format("graft.sources.v2.BagDataSource").load(dir)
      .groupBy("bag_file").count().as[(String, Long)].collect().toMap
    assert(counts === Map("w1_a" -> 8L, "w2_b" -> 5L))
    assert(BagScan.planCalls.get() === 0,
      "post-CALL, planning must be answered by the manifest alone")
  }

  test("CALL graft.extract runs the incremental extraction pipeline from SQL") {
    import java.nio.{ByteBuffer, ByteOrder}
    import java.nio.file.{Files, Paths}
    graft.plans.GraftExtensions.register(spark)
    val defn = "uint32 a\n"
    val dir = Files.createTempDirectory("graft-callext").toString
    def land(name: String, vals: Range): Unit = {
      def p(i: Int): Array[Byte] = {
        val bb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        bb.putInt(i); bb.array()
      }
      Files.write(Paths.get(dir, s"$name.bag"),
        graft.plans.BagCodec.pack(vals.map(i => ("m", 1000L + i, p(i))),
          "none", messagesPerChunk = 2, typeInfo = Some(("m/M", defn))))
    }
    land("c1", 0 until 4)
    val store = Files.createTempDirectory("graft-callext-store").toString
    val r1 = spark.sql(s"CALL graft.extract('$dir', '$store', 'm')").collect().head
    assert(r1.getAs[Long]("store_rows") === 4L)
    land("c2", 4 until 8)
    val r2 = spark.sql(s"CALL graft.extract('$dir', '$store', 'm')").collect().head
    assert(r2.getAs[String]("op") === "extract" &&
      r2.getAs[Long]("store_rows") === 8L)
    assert(graft.sources.Containers.readTypedStore(spark, store, "m")
      .select("a").as[Long].collect().sorted.toSeq === (0L until 8L))
  }

  test("CALL graft.export_symlink_manifest: external engines read the pinned snapshot; DV refusal; purge unblocks") {
    val t = freshTable("symlink")
    SnapshotStore.append((1L to 6L).map(i => (i, i * 10L)).toDF("id", "score")
      .coalesce(2), t, statsCols = Seq("id"))          // v1
    SnapshotStore.append(Seq((7L, 70L)).toDF("id", "score").coalesce(1),
      t, statsCols = Seq("id"))                        // v2
    val row = spark.sql(s"CALL graft.export_symlink_manifest('$t')")
      .collect().head
    assert(row.getAs[Long]("version") === 2L)
    assert(row.getAs[Int]("files") === SnapshotStore.state(spark, t).live.size)
    // the manifest IS the external contract: absolute URIs, one per
    // line, and a graft-less parquet read over them equals the snapshot
    val uris = spark.read.textFile(row.getAs[String]("manifest")).collect().toSeq
    assert(uris.size === row.getAs[Int]("files"))
    assert(uris.forall(_.startsWith("file:")), uris.mkString(","))
    val external = spark.read.parquet(uris: _*)
    assert(external.count() === 7L)
    assert(external.selectExpr("sum(score)").as[Long].head ===
      SnapshotStore.snapshot(spark, t).selectExpr("sum(score)").as[Long].head)
    // PINNED: a later commit doesn't move the manifest until re-CALL
    SnapshotStore.append(Seq((8L, 80L)).toDF("id", "score").coalesce(1), t)
    assert(spark.read.parquet(uris: _*).count() === 7L)
    val again = spark.sql(s"CALL graft.export_symlink_manifest('$t')")
      .collect().head
    assert(again.getAs[Long]("version") === 3L)
    val uris2 = spark.read.textFile(again.getAs[String]("manifest")).collect().toSeq
    assert(spark.read.parquet(uris2: _*).count() === 8L)
    // merge-on-read deletes are invisible to plain parquet: REFUSED
    spark.sql(s"CALL graft.enable_dv('$t')").collect()
    spark.sql(s"DELETE FROM graft.`$t` WHERE id > 6")
    val ex = intercept[Exception] {
      spark.sql(s"CALL graft.export_symlink_manifest('$t')").collect()
    }
    assert(ex.getMessage.contains("deletion vectors"), ex.getMessage)
    // purge_dv materializes the deletes; export works again and the
    // external read sees exactly the post-delete rows
    spark.sql(s"CALL graft.purge_dv('$t')").collect()
    val fixed = spark.sql(s"CALL graft.export_symlink_manifest('$t')")
      .collect().head
    val uris3 = spark.read.textFile(fixed.getAs[String]("manifest")).collect().toSeq
    assert(spark.read.parquet(uris3: _*).count() === 6L)
  }

  test("writeTo API rides the same catalog plumbing") {
    val t = freshTable("wt")
    SnapshotStore.append(Seq((1L, "a")).toDF("id", "v"), t)
    Seq((2L, "b")).toDF("id", "v").writeTo(s"graft.`$t`").append()
    assert(spark.sql(s"SELECT count(*) FROM graft.`$t`").as[Long].head === 2L)
    assert(SnapshotStore.versions(spark, t) === Seq(1L, 2L))
  }
}
