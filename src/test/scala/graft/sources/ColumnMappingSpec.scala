package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Column RENAME / DROP via name-mode column mapping: both are
  * METADATA-ONLY commits (physical parquet names never change, no file
  * is rewritten), old files keep reading, time travel sees each era's
  * names, stats re-key in the same commit, and every rewrite path
  * (compact / UPDATE / MERGE / DELETE) stays exact on a mapped table.
  */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(tag: String): String =
    "file:" + java.nio.file.Files
      .createTempDirectory(s"graft-map-$tag").toString + "/t"

  private def useCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.v2.SnapshotCatalog].getName)

  test("RENAME COLUMN is metadata-only: no rewrite, old data reads under the new name") {
    val t = freshTable("ren")
    SnapshotStore.append(Seq((1L, "a"), (2L, "b")).toDF("id", "val"), t,
      statsCols = Seq("id", "val"))
    val filesBefore = SnapshotStore.state(spark, t).live.map(_.path).toSet
    SnapshotStore.renameColumn(spark, t, "val", "label")
    // metadata-only: exactly the same data files are live
    val after = SnapshotStore.state(spark, t)
    assert(after.live.map(_.path).toSet === filesBefore,
      "rename must not rewrite any data file")
    // old data under the NEW name
    assert(SnapshotStore.snapshot(spark, t).columns.toSeq === Seq("id", "label"))
    assert(SnapshotStore.snapshot(spark, t).where(col("label") === "a")
      .select("id").as[Long].head() === 1L)
    // stats re-keyed in the same commit: pruning answers on the new name
    assert(after.live.forall(_.strStats.contains("label")),
      s"stats must re-key val->label, got ${after.live.map(_.strStats.keySet)}")
    // post-rename appends land under the same physical name
    SnapshotStore.append(Seq((3L, "c")).toDF("id", "label"), t,
      statsCols = Seq("id", "label"))
    assert(SnapshotStore.snapshot(spark, t).orderBy("id")
      .select("label").as[String].collect().toSeq === Seq("a", "b", "c"))
    // time travel sees each era's names
    assert(SnapshotStore.snapshot(spark, t, asOf = Some(1L)).columns.toSeq
      === Seq("id", "val"))
    assert(SnapshotStore.snapshot(spark, t, asOf = Some(1L))
      .where(col("val") === "b").select("id").as[Long].head() === 2L)
  }

  test("SQL surface: ALTER RENAME/DROP through the catalog; SELECT, filters, time travel") {
    useCatalog()
    val t = freshTable("sql")
    SnapshotStore.append((1L to 5L).map(i => (i, s"v$i", i * 10L))
      .toDF("id", "tag", "score"), t, statsCols = Seq("id", "score"))
    spark.sql(s"ALTER TABLE graft.`$t` RENAME COLUMN score TO points")
    // DSv2 catalog read: logical names, correct values, filter pushdown path
    assert(spark.sql(s"SELECT points FROM graft.`$t` WHERE id = 3")
      .as[Long].head() === 30L)
    assert(spark.sql(s"SELECT sum(points) FROM graft.`$t` WHERE points >= 30")
      .as[Long].head() === 120L)
    assert(spark.sql(s"SELECT * FROM graft.`$t`").columns.toSeq
      === Seq("id", "tag", "points"))
    // the pre-rename era keeps its name
    assert(spark.sql(s"SELECT * FROM graft.`$t` VERSION AS OF 1").columns.toSeq
      === Seq("id", "tag", "score"))
    // DROP COLUMN: metadata-only, the column disappears
    val filesBefore = SnapshotStore.state(spark, t).live.map(_.path).toSet
    spark.sql(s"ALTER TABLE graft.`$t` DROP COLUMN tag")
    assert(SnapshotStore.state(spark, t).live.map(_.path).toSet === filesBefore)
    assert(spark.sql(s"SELECT * FROM graft.`$t`").columns.toSeq
      === Seq("id", "points"))
    // re-ADD under the dropped name: old bytes must NOT resurrect
    spark.sql(s"ALTER TABLE graft.`$t` ADD COLUMNS (tag STRING)")
    val tags = spark.sql(s"SELECT tag FROM graft.`$t`").as[String].collect()
    assert(tags.forall(_ == null),
      s"re-added column must read null, not the dropped values: ${tags.toSeq}")
    // and writing into the re-added column works
    spark.sql(s"INSERT INTO graft.`$t` SELECT 6L, 60L, 'fresh'")
    assert(spark.sql(s"SELECT tag FROM graft.`$t` WHERE id = 6")
      .as[String].head() === "fresh")
  }

  test("path-addressed DSv2 read translates the mapping too") {
    val t = freshTable("dsv2")
    SnapshotStore.append(Seq((1L, 100L), (2L, 200L)).toDF("id", "x"), t,
      statsCols = Seq("id", "x"))
    SnapshotStore.renameColumn(spark, t, "x", "y")
    val df = spark.read.format("graft.sources.v2.SnapshotDataSource").load(t)
    assert(df.columns.toSeq === Seq("id", "y"))
    assert(df.where(col("y") === 200L).select("id").as[Long].head() === 2L)
    // versionAsOf pre-rename: old era's name
    assert(spark.read.format("graft.sources.v2.SnapshotDataSource")
      .option("versionAsOf", "1").load(t).columns.toSeq === Seq("id", "x"))
  }

  test("rewrite paths stay exact on a mapped table: compact, UPDATE, MERGE, DELETE") {
    useCatalog()
    val t = freshTable("rw")
    (0 until 4).foreach { i =>
      SnapshotStore.append(
        (0 until 50).map(j => ((i * 50 + j).toLong, (i * 50 + j).toLong))
          .toDF("id", "n").coalesce(1), t, statsCols = Seq("id", "n"))
    }
    SnapshotStore.renameColumn(spark, t, "n", "amount")
    // UPDATE through the renamed name
    spark.sql(s"UPDATE graft.`$t` SET amount = amount + 1000 WHERE id < 10")
    assert(spark.sql(s"SELECT sum(amount) FROM graft.`$t` WHERE id < 10")
      .as[Long].head() === (0L until 10L).sum + 10000L)
    // MERGE through the renamed name
    spark.range(5).selectExpr("id", "id * 2 AS m").createOrReplaceTempView("map_src")
    spark.sql(
      s"""MERGE INTO graft.`$t` g USING map_src s ON g.id = s.id
         |WHEN MATCHED THEN UPDATE SET amount = s.m
         |""".stripMargin)
    assert(spark.sql(s"SELECT amount FROM graft.`$t` WHERE id = 4")
      .as[Long].head() === 8L)
    // compaction rewrites files mapping-safely (new files still carry the
    // PHYSICAL name; reads stay logical)
    SnapshotStore.compact(spark, t, targetFiles = 1,
      statsCols = Seq("id", "amount"))
    assert(spark.sql(s"SELECT count(*) FROM graft.`$t`").as[Long].head() === 200L)
    assert(spark.sql(s"SELECT amount FROM graft.`$t` WHERE id = 4")
      .as[Long].head() === 8L)
    // DELETE with a predicate on the renamed column: ids 5..9 still
    // carry the +1000 update (0..4 were re-set by the merge) — 5 rows go
    spark.sql(s"DELETE FROM graft.`$t` WHERE amount >= 1000")
    assert(spark.sql(s"SELECT count(*) FROM graft.`$t`").as[Long].head() === 195L)
    // post-compaction the stats are harvested under the current logical
    // name — box pruning keys on it
    val snap = SnapshotStore.state(spark, t)
    assert(snap.live.forall(_.stats.contains("amount")),
      s"rewrite must harvest stats under the logical name, got ${snap.live.map(_.stats.keySet)}")
  }

  test("mapping survives overwrite and restore; rename-back dissolves it") {
    val t = freshTable("ow")
    SnapshotStore.append(Seq((1L, "a")).toDF("id", "v"), t)
    SnapshotStore.renameColumn(spark, t, "v", "w")           // v2
    SnapshotStore.overwrite(Seq((9L, "z")).toDF("id", "w"), t) // v3
    assert(SnapshotStore.snapshot(spark, t).columns.toSeq === Seq("id", "w"))
    assert(SnapshotStore.snapshot(spark, t).select("w").as[String].head() === "z")
    // restore to the mapped era: the old schema (and its mapping) returns
    SnapshotStore.restore(spark, t, 2L)
    assert(SnapshotStore.snapshot(spark, t).select("w").as[String].head() === "a")
    // rename back to the physical name: the mapping dissolves entirely
    SnapshotStore.renameColumn(spark, t, "w", "v")
    val recorded = SnapshotStore.tableSchema(spark, t).get
    assert(!SnapshotStore.hasMapping(recorded),
      "renaming back to the physical name must drop the mapping metadata")
    assert(SnapshotStore.snapshot(spark, t).select("v").as[String].head() === "a")
  }
}
