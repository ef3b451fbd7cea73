package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CHECK constraints as commit metadata (Delta's ALTER TABLE ADD
  * CONSTRAINT shape): `addConstraint` proves EXISTING rows once with a
  * bounded LIMIT-1 probe, then every subsequent write re-proves its own
  * rows in-plan (one assert_true filter inside the staging pass — no
  * separate validation scan). SQL CHECK three-valued semantics: NULL
  * passes, only FALSE violates. Constraints ride latest-wins meta, so
  * they survive compaction, DML rewrites, and clones; column
  * rename/drop is refused while a constraint references the column.
  */
class SnapshotConstraintSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(tag: String): String =
    "file:" + java.nio.file.Files
      .createTempDirectory(s"graft-cons-$tag").toString + "/t"

  private def useCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.v2.SnapshotCatalog].getName)

  test("add validates existing rows; violating writes fail and land nothing") {
    val t = freshTable("basic")
    SnapshotStore.append(Seq((1L, 10L), (2L, 20L)).toDF("id", "score"), t,
      statsCols = Seq("id"))
    // existing rows violate -> refused, no commit
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.addConstraint(spark, t, "hi_score", "score > 15")
    }
    assert(e.getMessage.contains("existing rows violate"))
    assert(SnapshotStore.constraints(spark, t).isEmpty)
    // a satisfiable constraint lands as a metadata-only commit
    val before = SnapshotStore.state(spark, t)
    SnapshotStore.addConstraint(spark, t, "pos_score", "score > 0")
    val after = SnapshotStore.state(spark, t)
    assert(after.live.map(_.path).toSet === before.live.map(_.path).toSet,
      "add_constraint must move zero data")
    assert(SnapshotStore.constraints(spark, t) === Map("pos_score" -> "score > 0"))
    // a violating write fails loudly and commits NOTHING
    val v = SnapshotStore.latestVersion(spark, t)
    intercept[Exception] {
      SnapshotStore.append(Seq((3L, -5L)).toDF("id", "score"), t)
    }
    assert(SnapshotStore.latestVersion(spark, t) === v,
      "a refused write must not commit")
    assert(SnapshotStore.snapshot(spark, t).count() === 2L)
    // a passing write proceeds
    SnapshotStore.append(Seq((3L, 30L)).toDF("id", "score"), t)
    assert(SnapshotStore.snapshot(spark, t).count() === 3L)
  }

  test("SQL CHECK semantics: NULL passes, only FALSE violates") {
    val t = freshTable("null")
    SnapshotStore.append(Seq((1L, Some("en"))).toDF("id", "lang"), t)
    SnapshotStore.addConstraint(spark, t, "en_only", "lang = 'en'")
    // NULL = 'en' is NULL, not FALSE -> passes
    SnapshotStore.append(Seq((2L, None: Option[String])).toDF("id", "lang"), t)
    intercept[Exception] {
      SnapshotStore.append(Seq((3L, Some("de"))).toDF("id", "lang"), t)
    }
    assert(SnapshotStore.snapshot(spark, t).count() === 2L)
  }

  test("drop retires enforcement; names are case-insensitive; duplicates refused") {
    val t = freshTable("drop")
    SnapshotStore.append(Seq((1L, 10L)).toDF("id", "score"), t)
    SnapshotStore.addConstraint(spark, t, "Pos_Score", "score > 0")
    // duplicate (any case) refused
    assert(intercept[IllegalArgumentException] {
      SnapshotStore.addConstraint(spark, t, "POS_SCORE", "score > 1")
    }.getMessage.contains("already exists"))
    // unknown drop refused
    assert(intercept[IllegalArgumentException] {
      SnapshotStore.dropConstraint(spark, t, "nope")
    }.getMessage.contains("no constraint"))
    SnapshotStore.dropConstraint(spark, t, "POS_SCORE")
    assert(SnapshotStore.constraints(spark, t).isEmpty)
    // formerly-violating rows now land
    SnapshotStore.append(Seq((2L, -1L)).toDF("id", "score"), t)
    assert(SnapshotStore.snapshot(spark, t).count() === 2L)
  }

  test("bad predicates refused at add time: unknown column, non-deterministic, subquery") {
    val t = freshTable("pred")
    SnapshotStore.append(Seq((1L, 10L)).toDF("id", "score"), t)
    intercept[Exception] { // unknown column fails analysis loudly HERE
      SnapshotStore.addConstraint(spark, t, "ghost", "missing_col > 0")
    }
    assert(intercept[IllegalArgumentException] {
      SnapshotStore.addConstraint(spark, t, "rnd", "rand() > 0.5")
    }.getMessage.contains("deterministic"))
    assert(intercept[IllegalArgumentException] {
      SnapshotStore.addConstraint(spark, t, "subq",
        "score > (SELECT 0)")
    }.getMessage.toLowerCase.contains("subquer"))
    assert(intercept[IllegalArgumentException] {
      SnapshotStore.addConstraint(spark, t, "bad name!", "score > 0")
    }.getMessage.contains("constraint name"))
    assert(SnapshotStore.constraints(spark, t).isEmpty)
  }

  test("DML rewrites enforce constraints; compaction of proven rows passes") {
    useCatalog()
    val t = freshTable("dml")
    SnapshotStore.append((1L to 8L).map(i => (i, i * 10L)).toDF("id", "score"),
      t, statsCols = Seq("id"))
    SnapshotStore.addConstraint(spark, t, "pos_score", "score > 0")
    // an UPDATE that would land violating rows fails; table unchanged
    val v = SnapshotStore.latestVersion(spark, t)
    intercept[Exception] {
      spark.sql(s"UPDATE graft.`$t` SET score = -1 WHERE id = 3")
    }
    assert(SnapshotStore.latestVersion(spark, t) === v)
    assert(SnapshotStore.snapshot(spark, t).where("score <= 0").count() === 0L)
    // a legal UPDATE proceeds under the constraint
    spark.sql(s"UPDATE graft.`$t` SET score = score + 1 WHERE id = 3")
    assert(SnapshotStore.snapshot(spark, t).where("id = 3")
      .select("score").as[Long].head() === 31L)
    // compaction re-stages proven rows: passes, constraint survives
    SnapshotStore.compact(spark, t, targetFiles = 1)
    assert(SnapshotStore.constraints(spark, t) === Map("pos_score" -> "score > 0"))
    intercept[Exception] {
      SnapshotStore.append(Seq((9L, 0L)).toDF("id", "score"), t)
    }
  }

  test("rename/drop refused while a constraint references the column") {
    val t = freshTable("ref")
    SnapshotStore.append(Seq((1L, 10L, "a")).toDF("id", "score", "tag"), t)
    SnapshotStore.addConstraint(spark, t, "pos_score", "score > 0")
    assert(intercept[IllegalArgumentException] {
      SnapshotStore.renameColumn(spark, t, "score", "points")
    }.getMessage.contains("referenced by CHECK constraint"))
    assert(intercept[IllegalArgumentException] {
      SnapshotStore.dropColumn(spark, t, "score")
    }.getMessage.contains("referenced by CHECK constraint"))
    // unreferenced columns still retire freely
    SnapshotStore.renameColumn(spark, t, "tag", "label")
    // retire the constraint -> the column retires too
    SnapshotStore.dropConstraint(spark, t, "pos_score")
    SnapshotStore.renameColumn(spark, t, "score", "points")
    assert(SnapshotStore.snapshot(spark, t).columns.toSeq
      === Seq("id", "points", "label"))
  }

  test("SQL procedure surface: CALL add_constraint / drop_constraint") {
    useCatalog()
    val t = freshTable("sql")
    SnapshotStore.append(Seq((1L, 10L)).toDF("id", "score"), t)
    val row = spark.sql(
      s"CALL graft.add_constraint('$t', 'pos', 'score > 0')").collect().head
    assert(row.getInt(1) === 1) // one active constraint
    intercept[Exception] {
      SnapshotStore.append(Seq((2L, -1L)).toDF("id", "score"), t)
    }
    val row2 = spark.sql(
      s"CALL graft.drop_constraint('$t', 'pos')").collect().head
    assert(row2.getInt(1) === 0)
    SnapshotStore.append(Seq((2L, -1L)).toDF("id", "score"), t)
    assert(SnapshotStore.snapshot(spark, t).count() === 2L)
  }

  test("ANSI SQL surface: ALTER TABLE ADD/DROP CONSTRAINT ... CHECK") {
    useCatalog()
    val t = freshTable("ansi")
    SnapshotStore.append(Seq((1L, 10L)).toDF("id", "score"), t)
    spark.sql(s"ALTER TABLE graft.`$t` ADD CONSTRAINT pos CHECK (score > 0)")
    assert(SnapshotStore.constraints(spark, t).keySet === Set("pos"))
    intercept[Exception] {
      spark.sql(s"INSERT INTO graft.`$t` VALUES (2, -5)")
    }
    assert(SnapshotStore.snapshot(spark, t).count() === 1L)
    // existing rows violating the predicate refuse the ADD itself
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$t` ADD CONSTRAINT hi CHECK (score > 100)")
    }
    assert(SnapshotStore.constraints(spark, t).keySet === Set("pos"))
    // PK/UNIQUE/FK are refused loudly (a lake table cannot enforce them)
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$t` ADD CONSTRAINT pk PRIMARY KEY (id)")
    }
    spark.sql(s"ALTER TABLE graft.`$t` DROP CONSTRAINT pos")
    spark.sql(s"INSERT INTO graft.`$t` VALUES (2, -5)")
    assert(SnapshotStore.snapshot(spark, t).count() === 2L)
    // DROP CONSTRAINT IF EXISTS tolerates unknown names; bare DROP refuses
    spark.sql(s"ALTER TABLE graft.`$t` DROP CONSTRAINT IF EXISTS nope")
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$t` DROP CONSTRAINT nope")
    }
  }

  test("constraints enforce on column-mapped tables (logical names)") {
    val t = freshTable("map")
    SnapshotStore.append(Seq((1L, 10L)).toDF("id", "score"), t,
      statsCols = Seq("score"))
    // rename first, THEN constrain the new logical name: enforcement
    // must evaluate on the logical frame (before physical rename)
    SnapshotStore.renameColumn(spark, t, "score", "points")
    SnapshotStore.addConstraint(spark, t, "pos", "points > 0")
    SnapshotStore.append(Seq((2L, 20L)).toDF("id", "points"), t)
    intercept[Exception] {
      SnapshotStore.append(Seq((3L, -1L)).toDF("id", "points"), t)
    }
    assert(SnapshotStore.snapshot(spark, t).orderBy("id")
      .select("points").as[Long].collect().toSeq === Seq(10L, 20L))
  }
}
