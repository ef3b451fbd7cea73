package graft.plans

import java.util.concurrent.CountDownLatch

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.SnapshotStore

/** SQL MERGE INTO over SnapshotStore tables: semantics (update / delete
  * / insert / not-matched-by-source, first-match clause order),
  * touched-file pruning, cardinality violation, and commit-conflict
  * detection.
  */
class SnapshotMergeSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(prefix: String): String =
    "file:" + java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  private def useCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.v2.SnapshotCatalog].getName)

  test("MERGE: matched update + not-matched insert, pure SQL text") {
    useCatalog()
    val t = freshTable("graft-merge")
    SnapshotStore.append(
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("id", "tag", "n"),
      t, statsCols = Seq("id"))
    Seq((2L, "B", 200L), (4L, "D", 400L)).toDF("id", "tag", "n")
      .createOrReplaceTempView("merge_src")
    spark.sql(
      s"""MERGE INTO graft.`$t` t USING merge_src s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET tag = s.tag, n = s.n + 1
         |WHEN NOT MATCHED THEN INSERT (id, tag, n) VALUES (s.id, s.tag, s.n)
         |""".stripMargin)
    val out = SnapshotStore.snapshot(spark, t)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq((1L, "a", 10L), (2L, "B", 201L), (3L, "c", 30L),
      (4L, "D", 400L)))
    val (v, op, _) = SnapshotStore.history(spark, t).head
    assert(v === 2L && op === "merge")
  }

  test("MERGE: conditional matched DELETE and clause-order first-match") {
    useCatalog()
    val t = freshTable("graft-merge-del")
    SnapshotStore.append(
      (1L to 6L).map(i => (i, i * 10)).toDF("id", "n"), t, statsCols = Seq("id"))
    (1L to 6L).map(i => (i, i)).toDF("id", "v").createOrReplaceTempView("mdel_src")
    // first clause wins: id <= 2 deletes; the catch-all update only
    // applies to the remaining matches
    spark.sql(
      s"""MERGE INTO graft.`$t` t USING mdel_src s
         |ON t.id = s.id
         |WHEN MATCHED AND s.v <= 2 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET n = t.n + s.v
         |""".stripMargin)
    val out = SnapshotStore.snapshot(spark, t)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq((3L, 33L), (4L, 44L), (5L, 55L), (6L, 66L)))
  }

  test("MERGE: NOT MATCHED BY SOURCE update and delete") {
    useCatalog()
    val t = freshTable("graft-merge-nmbs")
    SnapshotStore.append(
      (1L to 5L).map(i => (i, "keep")).toDF("id", "st"), t, statsCols = Seq("id"))
    Seq(2L, 4L).toDF("id").createOrReplaceTempView("nmbs_src")
    spark.sql(
      s"""MERGE INTO graft.`$t` t USING nmbs_src s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET st = 'matched'
         |WHEN NOT MATCHED BY SOURCE AND t.id = 5 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET st = 'stale'
         |""".stripMargin)
    val out = SnapshotStore.snapshot(spark, t)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(out === Seq((1L, "stale"), (2L, "matched"), (3L, "stale"),
      (4L, "matched")))
  }

  test("MERGE prunes to touched files: disjoint-key files survive by path") {
    useCatalog()
    val t = freshTable("graft-merge-prune")
    // three key-disjoint files via three appends
    SnapshotStore.append((1L to 10L).map(i => (i, 0L)).toDF("id", "n"), t,
      statsCols = Seq("id"))
    SnapshotStore.append((11L to 20L).map(i => (i, 0L)).toDF("id", "n"), t,
      statsCols = Seq("id"))
    SnapshotStore.append((21L to 30L).map(i => (i, 0L)).toDF("id", "n"), t,
      statsCols = Seq("id"))
    val before = SnapshotStore.state(spark, t).live.map(_.path).toSet
    Seq((15L, 1L)).toDF("id", "n").createOrReplaceTempView("mprune_src")
    spark.sql(
      s"""MERGE INTO graft.`$t` t USING mprune_src s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET n = s.n
         |WHEN NOT MATCHED THEN INSERT (id, n) VALUES (s.id, s.n)
         |""".stripMargin)
    val after = SnapshotStore.state(spark, t).live.map(_.path).toSet
    // every file whose [min,max] cannot hold key 15 survives BY PATH —
    // exactly ONE file rewrites
    assert((before -- after).size === 1,
      s"only the file holding key 15 may rewrite: removed=${before -- after}")
    assert((before & after).size === before.size - 1)
    assert(SnapshotStore.snapshot(spark, t).filter(col("id") === 15L)
      .select("n").as[Long].head() === 1L)
    assert(SnapshotStore.snapshot(spark, t).count() === 30L)
  }

  test("MERGE: insert-only merge appends without rewriting any file") {
    useCatalog()
    val t = freshTable("graft-merge-insonly")
    SnapshotStore.append((1L to 5L).map(i => (i, 0L)).toDF("id", "n"), t,
      statsCols = Seq("id"))
    val before = SnapshotStore.state(spark, t).live.map(_.path).toSet
    Seq((3L, 9L), (7L, 9L)).toDF("id", "n").createOrReplaceTempView("mio_src")
    spark.sql(
      s"""MERGE INTO graft.`$t` t USING mio_src s
         |ON t.id = s.id
         |WHEN NOT MATCHED THEN INSERT (id, n) VALUES (s.id, s.n)
         |""".stripMargin)
    val after = SnapshotStore.state(spark, t).live.map(_.path).toSet
    assert(before.subsetOf(after), "insert-only merge must not remove files")
    val out = SnapshotStore.snapshot(spark, t)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (5L, 0L), (7L, 9L)))
  }

  test("MERGE WITH SCHEMA EVOLUTION: the source's new column widens the table") {
    useCatalog()
    val t = freshTable("graft-merge-evo")
    SnapshotStore.append(Seq((1L, 10L), (2L, 20L)).toDF("id", "n"), t,
      statsCols = Seq("id"))
    Seq((2L, 200L, "fresh"), (3L, 300L, "new")).toDF("id", "n", "extra")
      .createOrReplaceTempView("mevo_src")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO graft.`$t` t USING mevo_src s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *
         |""".stripMargin)
    val out = SnapshotStore.snapshot(spark, t)
      .select("id", "n", "extra")
      .as[(Long, Long, Option[String])].collect().sortBy(_._1).toSeq
    assert(out === Seq((1L, 10L, None), (2L, 200L, Some("fresh")),
      (3L, 300L, Some("new"))),
      "evolved column: matched/inserted rows carry it, untouched rows null-fill")
    // history shows the evolution as its own metadata commit before the merge
    val ops = SnapshotStore.history(spark, t).map(_._2)
    assert(ops.contains("alter_schema") && ops.head === "merge", s"ops=$ops")
  }

  test("UPDATE: conditional assignment rewrites only the files holding matches") {
    useCatalog()
    val t = freshTable("graft-update")
    SnapshotStore.append((1L to 10L).map(i => (i, i * 10, "x")).toDF("id", "n", "tag")
      .coalesce(1), t, statsCols = Seq("id"))
    SnapshotStore.append((11L to 20L).map(i => (i, i * 10, "x")).toDF("id", "n", "tag")
      .coalesce(1), t, statsCols = Seq("id"))
    val before = SnapshotStore.state(spark, t).live.map(_.path).toSet
    spark.sql(s"UPDATE graft.`$t` SET n = n + 1, tag = 'hit' WHERE id IN (3, 7)")
    val after = SnapshotStore.state(spark, t)
    // only the first file (ids 1-10) rewrites; the second survives by path
    assert((before & after.live.map(_.path).toSet).size === 1,
      "the file with no matching rows must survive by path")
    // the rewrite re-harvests the stats the table tracked (id)
    assert(after.live.forall(_.stats.contains("id")),
      "update must not degrade the table's harvested stats")
    val rows = SnapshotStore.snapshot(spark, t)
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(rows === (1L to 20L).map(i =>
      if (i == 3 || i == 7) (i, i * 10 + 1, "hit") else (i, i * 10, "x")))
    val (v, op, _) = SnapshotStore.history(spark, t).head
    assert(op === "update" && v === 3L)
    // no matches: no commit
    spark.sql(s"UPDATE graft.`$t` SET n = 0 WHERE id > 999")
    assert(SnapshotStore.latestVersion(spark, t) === 3L)
  }

  test("UPDATE rejects a non-deterministic condition") {
    useCatalog()
    val t = freshTable("graft-update-nd")
    SnapshotStore.append(Seq((1L, 1L)).toDF("id", "n"), t)
    val err = intercept[Exception] {
      spark.sql(s"UPDATE graft.`$t` SET n = 0 WHERE rand() < 0.5")
    }
    assert(err.getMessage.contains("deterministic"))
  }

  test("MERGE rejects the ANSI cardinality violation") {
    useCatalog()
    val t = freshTable("graft-merge-card")
    SnapshotStore.append(Seq((1L, 0L)).toDF("id", "n"), t, statsCols = Seq("id"))
    Seq((1L, 10L), (1L, 20L)).toDF("id", "n").createOrReplaceTempView("mcard_src")
    val err = intercept[UnsupportedOperationException] {
      spark.sql(
        s"""MERGE INTO graft.`$t` t USING mcard_src s
           |ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET n = s.n
           |""".stripMargin)
    }
    assert(err.getMessage.contains("multiple source rows matched"))
  }

  test("MERGE: legal multi-match never duplicates the target row") {
    useCatalog()
    val t = freshTable("graft-merge-multi")
    SnapshotStore.append(Seq((1L, 0L), (2L, 0L)).toDF("id", "n"), t,
      statsCols = Seq("id"))
    // both source rows match target id=1 on the ON keys, but only ONE
    // satisfies the matched-clause condition — legal per ANSI, and the
    // target row must appear exactly once, updated
    Seq((1L, 10L), (1L, 99L)).toDF("id", "v").createOrReplaceTempView("mm_src")
    spark.sql(
      s"""MERGE INTO graft.`$t` t USING mm_src s
         |ON t.id = s.id
         |WHEN MATCHED AND s.v < 50 THEN UPDATE SET n = s.v
         |""".stripMargin)
    val out = SnapshotStore.snapshot(spark, t)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq((1L, 10L), (2L, 0L)),
      "one applying copy updates; the non-applying copy must not " +
        "resurrect the pre-image as a duplicate row")
  }

  test("MERGE: multi-match with zero applying clauses keeps the row once") {
    useCatalog()
    val t = freshTable("graft-merge-multi0")
    SnapshotStore.append(Seq((1L, 7L)).toDF("id", "n"), t, statsCols = Seq("id"))
    Seq((1L, 100L), (1L, 200L)).toDF("id", "v").createOrReplaceTempView("mm0_src")
    spark.sql(
      s"""MERGE INTO graft.`$t` t USING mm0_src s
         |ON t.id = s.id
         |WHEN MATCHED AND s.v < 50 THEN UPDATE SET n = s.v
         |WHEN NOT MATCHED THEN INSERT (id, n) VALUES (s.id, s.v)
         |""".stripMargin)
    val out = SnapshotStore.snapshot(spark, t)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq((1L, 7L)),
      "neither copy applies a clause: the row carries over exactly once, " +
        "and matched source rows must not fall through to INSERT")
  }

  test("MERGE: an applied DELETE wins over a non-applying sibling copy") {
    useCatalog()
    val t = freshTable("graft-merge-multidel")
    SnapshotStore.append(Seq((1L, 0L), (2L, 0L)).toDF("id", "n"), t,
      statsCols = Seq("id"))
    Seq((1L, 1L), (1L, 99L)).toDF("id", "v").createOrReplaceTempView("mmd_src")
    spark.sql(
      s"""MERGE INTO graft.`$t` t USING mmd_src s
         |ON t.id = s.id
         |WHEN MATCHED AND s.v < 50 THEN DELETE
         |""".stripMargin)
    val out = SnapshotStore.snapshot(spark, t)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq((2L, 0L)),
      "the deleting copy must win — the non-applying copy cannot keep " +
        "the row alive")
  }

  test("MERGE: NMBS-only merge with duplicate source keys stays exact") {
    useCatalog()
    val t = freshTable("graft-merge-nmbsdup")
    SnapshotStore.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "st"), t,
      statsCols = Seq("id"))
    // id=1 matches TWO source rows; with no matched clause the probe is
    // not a cardinality violation, but the full-outer join still emits
    // two copies — pre-round-12 this wrote row 1 twice
    Seq(1L, 1L).toDF("id").createOrReplaceTempView("nmbsdup_src")
    spark.sql(
      s"""MERGE INTO graft.`$t` t USING nmbsdup_src s
         |ON t.id = s.id
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET st = 'stale'
         |""".stripMargin)
    val out = SnapshotStore.snapshot(spark, t)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(out === Seq((1L, "a"), (2L, "stale"), (3L, "stale")))
  }

  test("MERGE: inserts survive the multi-match dedup path") {
    useCatalog()
    val t = freshTable("graft-merge-multiins")
    SnapshotStore.append(Seq((1L, 0L)).toDF("id", "n"), t, statsCols = Seq("id"))
    // a legal multi-match on id=1 forces the dedup window; the two
    // unmatched inserts must BOTH land (source-only rows are never
    // collapsed with each other)
    Seq((1L, 10L), (1L, 99L), (7L, 70L), (8L, 80L)).toDF("id", "v")
      .createOrReplaceTempView("mmi_src")
    spark.sql(
      s"""MERGE INTO graft.`$t` t USING mmi_src s
         |ON t.id = s.id
         |WHEN MATCHED AND s.v < 50 THEN UPDATE SET n = s.v
         |WHEN NOT MATCHED THEN INSERT (id, n) VALUES (s.id, s.v)
         |""".stripMargin)
    val out = SnapshotStore.snapshot(spark, t)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq((1L, 10L), (7L, 70L), (8L, 80L)))
  }

  test("UPDATE: nested-field assignment rebuilds the struct, siblings and NULLs survive") {
    useCatalog()
    val t = freshTable("graft-upd-nested")
    // the typed-extraction-store shape: one NULLABLE struct per topic —
    // rows of other topics carry a NULL struct and must stay NULL
    val df = spark.sql(
      """SELECT id,
        |  CASE WHEN id <= 3 THEN named_struct('lang', concat('l', id), 'n', id * 10)
        |  END AS meta, 'x' AS tag
        |FROM range(1, 6) AS r(id)""".stripMargin)
    SnapshotStore.append(df, t, statsCols = Seq("id"))
    spark.sql(s"UPDATE graft.`$t` SET meta.n = meta.n + 1000, tag = 'hit' " +
      s"WHERE id % 2 = 1")
    val out = SnapshotStore.snapshot(spark, t)
      .selectExpr("id", "meta.lang", "meta.n", "tag")
      .as[(Long, Option[String], Option[Long], String)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (1L, Some("l1"), Some(1010L), "hit"),  // nested leaf updated, sibling kept
      (2L, Some("l2"), Some(20L), "x"),      // unmatched row untouched
      (3L, Some("l3"), Some(1030L), "hit"),
      (4L, None, None, "x"),
      (5L, None, None, "hit")))              // matched NULL struct stays NULL
  }

  test("UPDATE: two-level nested assignment recurses, whole-column+nested overlap refused") {
    useCatalog()
    val t = freshTable("graft-upd-nested2")
    val df = spark.sql(
      """SELECT id, named_struct(
        |  'geo', named_struct('lat', CAST(id AS DOUBLE), 'lon', CAST(-id AS DOUBLE)),
        |  'n', id) AS meta
        |FROM range(1, 4) AS r(id)""".stripMargin)
    SnapshotStore.append(df, t, statsCols = Seq("id"))
    spark.sql(s"UPDATE graft.`$t` SET meta.geo.lat = meta.geo.lat + 90.0 WHERE id = 2")
    val out = SnapshotStore.snapshot(spark, t)
      .selectExpr("id", "meta.geo.lat", "meta.geo.lon", "meta.n")
      .as[(Long, Double, Double, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq((1L, 1.0, -1.0, 1L), (2L, 92.0, -2.0, 2L), (3L, 3.0, -3.0, 3L)))
    val err = intercept[UnsupportedOperationException] {
      spark.sql(s"UPDATE graft.`$t` SET meta = named_struct('geo', meta.geo, 'n', 0L), " +
        s"meta.n = 1 WHERE id = 1")
    }
    assert(err.getMessage.contains("overlaps"), s"got: ${err.getMessage}")
  }

  test("MERGE: nested-field assignment in WHEN MATCHED, mixed with top-level") {
    useCatalog()
    val t = freshTable("graft-merge-nested")
    val df = spark.sql(
      """SELECT id, named_struct('lang', concat('l', id), 'n', id * 10) AS meta,
        |  0L AS seen
        |FROM range(1, 4) AS r(id)""".stripMargin)
    SnapshotStore.append(df, t, statsCols = Seq("id"))
    Seq((2L, 999L), (9L, 900L)).toDF("id", "v").createOrReplaceTempView("mnst_src")
    spark.sql(
      s"""MERGE INTO graft.`$t` t USING mnst_src s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET t.meta.n = s.v, seen = 1
         |WHEN NOT MATCHED THEN INSERT (id, seen) VALUES (s.id, 2)
         |""".stripMargin)
    val out = SnapshotStore.snapshot(spark, t)
      .selectExpr("id", "meta.lang", "meta.n", "seen")
      .as[(Long, Option[String], Option[Long], Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (1L, Some("l1"), Some(10L), 0L),
      (2L, Some("l2"), Some(999L), 1L),   // nested leaf from source, sibling kept
      (3L, Some("l3"), Some(30L), 0L),
      (9L, None, None, 2L)))              // insert null-fills the struct whole
  }

  test("MERGE/UPDATE refuse reserved __-prefixed working columns") {
    useCatalog()
    val t = freshTable("graft-merge-resv")
    SnapshotStore.append(Seq((1L, 0L)).toDF("id", "__fp"), t, statsCols = Seq("id"))
    val err = intercept[UnsupportedOperationException] {
      spark.sql(s"UPDATE graft.`$t` SET __fp = 1 WHERE id = 1")
    }
    assert(err.getMessage.contains("reserved"), s"got: ${err.getMessage}")
    val t2 = freshTable("graft-merge-resv2")
    SnapshotStore.append(Seq((1L, 0L)).toDF("id", "n"), t2, statsCols = Seq("id"))
    Seq((1L, 0L)).toDF("id", "__part").createOrReplaceTempView("resv_src")
    val err2 = intercept[UnsupportedOperationException] {
      spark.sql(
        s"""MERGE INTO graft.`$t2` t USING resv_src s
           |ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET n = 1
           |""".stripMargin)
    }
    assert(err2.getMessage.contains("reserved"), s"got: ${err2.getMessage}")
  }

  test("MERGE rejects TABLESAMPLE and unordered LIMIT sources, accepts ordered LIMIT") {
    useCatalog()
    val t = freshTable("graft-merge-ndshape")
    SnapshotStore.append(Seq((1L, 0L)).toDF("id", "n"), t, statsCols = Seq("id"))
    spark.range(10).selectExpr("id", "id AS v").createOrReplaceTempView("shape_src")
    def merge(src: String): Unit = spark.sql(
      s"""MERGE INTO graft.`$t` t USING ($src) s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET n = s.v
         |""".stripMargin)
    // every expression in these plans is deterministic — the SHAPE isn't
    val e1 = intercept[Exception](merge("SELECT * FROM shape_src TABLESAMPLE (50 PERCENT)"))
    assert(e1.getMessage.contains("deterministic"), s"got: ${e1.getMessage}")
    val e2 = intercept[Exception](merge("SELECT * FROM shape_src LIMIT 3"))
    assert(e2.getMessage.contains("deterministic"), s"got: ${e2.getMessage}")
    // SORT BY is sortWithinPartitions (global=false): partitions are
    // ordered but WHICH rows the limit picks across partitions is
    // scheduling-dependent — must be rejected like the bare LIMIT
    val e3 = intercept[Exception](merge("SELECT * FROM shape_src SORT BY id LIMIT 3"))
    assert(e3.getMessage.contains("deterministic"), s"got: ${e3.getMessage}")
    merge("SELECT * FROM shape_src ORDER BY id LIMIT 3") // sorted LIMIT is fine
    // a deterministic ordered SUBQUERY under the limit keeps its Sort
    // below a SubqueryAlias — the guard must look through the alias
    merge("SELECT * FROM (SELECT * FROM shape_src ORDER BY id) LIMIT 3")
    assert(SnapshotStore.snapshot(spark, t).select("n").as[Long].head() === 1L)
  }

  test("UPDATE: sibling assignments differing only in case are legal when case-sensitive") {
    useCatalog()
    val t = freshTable("graft-upd-case")
    SnapshotStore.append(
      spark.sql("SELECT id, named_struct('lo', CAST(0 AS LONG), 'LO', CAST(0 AS LONG)) AS m FROM range(3)"),
      t, statsCols = Seq("id"))
    val prev = spark.conf.get("spark.sql.caseSensitive")
    try {
      spark.conf.set("spark.sql.caseSensitive", "true")
      // distinct fields `m.lo` / `m.LO` — unconditional lowercasing in
      // the overlap check would falsely refuse this as a conflict
      spark.sql(s"UPDATE graft.`$t` SET m.lo = 1, m.LO = 2 WHERE id = 1")
      val row = SnapshotStore.snapshot(spark, t)
        .selectExpr("m.lo", "m.LO").where("id = 1").head()
      assert(row.getLong(0) === 1L && row.getLong(1) === 2L)
      // genuine duplicates still refuse under case sensitivity
      val err = intercept[UnsupportedOperationException] {
        spark.sql(s"UPDATE graft.`$t` SET m.lo = 1, m.lo = 2 WHERE id = 1")
      }
      assert(err.getMessage.contains("overlaps"), s"got: ${err.getMessage}")
    } finally spark.conf.set("spark.sql.caseSensitive", prev)
  }

  test("UPDATE: top-level columns differing only in case pair and assign correctly when case-sensitive") {
    useCatalog()
    val t = freshTable("graft-upd-colcase")
    val prev = spark.conf.get("spark.sql.caseSensitive")
    try {
      spark.conf.set("spark.sql.caseSensitive", "true")
      SnapshotStore.append(
        spark.sql("SELECT id, CAST(0 AS LONG) AS v, CAST(100 AS LONG) AS V FROM range(3)"),
        t, statsCols = Seq("id"))
      // a lowercase output map would collide v/V: both origs rebind to
      // ONE fresh attribute and the un-assigned twin silently takes the
      // other column's value
      spark.sql(s"UPDATE graft.`$t` SET v = 7 WHERE id = 1")
      val rows = SnapshotStore.snapshot(spark, t)
        .selectExpr("id", "v", "V").orderBy("id").collect()
      assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
        Seq((0L, 0L, 100L), (1L, 7L, 100L), (2L, 0L, 100L)),
        "only lowercase v at id=1 changes; uppercase V never moves")
    } finally spark.conf.set("spark.sql.caseSensitive", prev)
  }

  test("UPDATE: array-broadcast field assignment rebuilds every element; NULL arrays survive") {
    useCatalog()
    val t = freshTable("graft-upd-arr")
    // the typed-store shape: array<struct> detections per row, one row
    // with a NULL array
    SnapshotStore.append(
      spark.sql(
        """SELECT id,
          |  CASE WHEN id = 2 THEN CAST(NULL AS ARRAY<STRUCT<cls: STRING, score: DOUBLE>>)
          |       ELSE array(named_struct('cls', 'car', 'score', CAST(id AS DOUBLE)),
          |                  named_struct('cls', 'ped', 'score', CAST(id + 10 AS DOUBLE)))
          |  END AS dets
          |FROM range(4)""".stripMargin),
      t, statsCols = Seq("id"))
    spark.sql(s"UPDATE graft.`$t` SET dets.score = 0.5 WHERE id % 2 = 1")
    val rows = SnapshotStore.snapshot(spark, t)
      .selectExpr("id", "transform(dets, d -> d.cls) AS cls",
        "transform(dets, d -> d.score) AS sc")
      .orderBy("id").collect()
    // updated rows: every element's score broadcast to 0.5, cls kept
    assert(rows(1).getSeq[Double](2) === Seq(0.5, 0.5))
    assert(rows(3).getSeq[Double](2) === Seq(0.5, 0.5))
    assert(rows(1).getSeq[String](1) === Seq("car", "ped"))
    // untouched rows keep their values; the NULL array stays NULL
    assert(rows(0).getSeq[Double](2) === Seq(0.0, 10.0))
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2))
    // overlap validation extends to element paths: dets vs dets.score
    val err = intercept[UnsupportedOperationException] {
      spark.sql(s"UPDATE graft.`$t` SET dets = NULL, dets.score = 1.0 WHERE id = 0")
    }
    assert(err.getMessage.contains("overlaps"), s"got: ${err.getMessage}")
  }

  test("MERGE: array-broadcast assignment in WHEN MATCHED uses the source value per row") {
    useCatalog()
    val t = freshTable("graft-merge-arr")
    SnapshotStore.append(
      spark.sql(
        """SELECT id, array(named_struct('cls', 'car', 'score', CAST(id AS DOUBLE)),
          |                 named_struct('cls', 'ped', 'score', CAST(id + 10 AS DOUBLE))) AS dets
          |FROM range(3)""".stripMargin),
      t, statsCols = Seq("id"))
    spark.range(2).selectExpr("id", "CAST(id * 100 AS DOUBLE) AS s")
      .createOrReplaceTempView("arr_src")
    // Spark's merge resolution coerces the value to the key's extracted
    // type array<double>, so the merge-side broadcast is spelled
    // array_repeat — assigned element-wise by position
    spark.sql(
      s"""MERGE INTO graft.`$t` g USING arr_src s ON g.id = s.id
         |WHEN MATCHED THEN UPDATE SET dets.score = array_repeat(s.s, size(g.dets))
         |""".stripMargin)
    val sc = SnapshotStore.snapshot(spark, t)
      .selectExpr("id", "transform(dets, d -> d.score) AS sc")
      .orderBy("id").collect()
    assert(sc(0).getSeq[Double](1) === Seq(0.0, 0.0))
    assert(sc(1).getSeq[Double](1) === Seq(100.0, 100.0))
    assert(sc(2).getSeq[Double](1) === Seq(2.0, 12.0), "unmatched row untouched")
  }

  test("UPDATE: array-typed value assigns element-wise by position, short arrays null-fill") {
    useCatalog()
    val t = freshTable("graft-upd-arrpos")
    SnapshotStore.append(
      spark.sql(
        """SELECT id, array(named_struct('cls', 'car', 'score', 1.0D),
          |                 named_struct('cls', 'ped', 'score', 2.0D)) AS dets
          |FROM range(2)""".stripMargin),
      t, statsCols = Seq("id"))
    spark.sql(s"UPDATE graft.`$t` SET dets.score = array(9.0D) WHERE id = 1")
    val sc = SnapshotStore.snapshot(spark, t)
      .selectExpr("id", "transform(dets, d -> d.score) AS sc")
      .orderBy("id").collect()
    assert(sc(0).getSeq[java.lang.Double](1)
      === Seq[java.lang.Double](1.0, 2.0))
    assert(sc(1).getSeq[java.lang.Double](1)
      === Seq[java.lang.Double](9.0, null),
      "position 0 takes the value, the unmatched tail null-fills")
  }

  test("MERGE rejects a non-deterministic source") {
    useCatalog()
    val t = freshTable("graft-merge-ndsrc")
    SnapshotStore.append(Seq((1L, 0L)).toDF("id", "n"), t, statsCols = Seq("id"))
    spark.range(3).selectExpr("id", "rand() AS v")
      .createOrReplaceTempView("ndsrc")
    val err = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO graft.`$t` t USING ndsrc s
           |ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET n = 1
           |""".stripMargin)
    }
    assert(err.getMessage.contains("deterministic"), s"got: ${err.getMessage}")
  }

  test("MERGE detects a conflicting commit on a touched file") {
    useCatalog()
    val t = freshTable("graft-merge-conflict")
    SnapshotStore.append((1L to 5L).map(i => (i, 0L)).toDF("id", "n"), t,
      statsCols = Seq("id"))
    // the source BLOCKS mid-evaluation (after the merge read table
    // state) while the main thread lands a conflicting upsert on the
    // same file — the merge's commit must fail mustBeLive re-validation
    SnapshotMergeSpec.sourceEvaluating = new CountDownLatch(1)
    SnapshotMergeSpec.conflictLanded = new CountDownLatch(1)
    val src = Seq((2L, 9L)).toDS()
      .mapPartitions { it =>
        SnapshotMergeSpec.sourceEvaluating.countDown()
        SnapshotMergeSpec.conflictLanded.await()
        it
      }.toDF("id", "n")
    src.createOrReplaceTempView("mconf_src")
    @volatile var thrown: Throwable = null
    val merger = new Thread(() =>
      try spark.sql(
        s"""MERGE INTO graft.`$t` t USING mconf_src s
           |ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET n = s.n
           |""".stripMargin)
      catch { case e: Throwable => thrown = e })
    merger.start()
    val sawSource = SnapshotMergeSpec.sourceEvaluating.await(
      120, java.util.concurrent.TimeUnit.SECONDS)
    if (!sawSource) {
      SnapshotMergeSpec.conflictLanded.countDown() // unblock, then report
      merger.join(30000)
      fail(s"merge never evaluated its source; merge outcome: $thrown")
    }
    SnapshotStore.upsert(Seq((2L, 5L)).toDF("id", "n"), t, keyCols = Seq("id"))
    SnapshotMergeSpec.conflictLanded.countDown()
    merger.join(120000)
    assert(thrown != null, "merge must not silently resurrect replaced rows")
    val root = Seq(thrown, thrown.getCause).filter(_ != null)
      .exists(e => e.isInstanceOf[java.util.ConcurrentModificationException] ||
        Option(e.getMessage).exists(_.contains("no longer live")))
    assert(root, s"expected a commit conflict, got: $thrown")
    // the winning upsert's value is intact
    assert(SnapshotStore.snapshot(spark, t).filter(col("id") === 2L)
      .select("n").as[Long].head() === 5L)
  }
}

object SnapshotMergeSpec {
  @volatile var sourceEvaluating: CountDownLatch = _
  @volatile var conflictLanded: CountDownLatch = _
}
