package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Commit-log protocol versioning (Delta's minReaderVersion +
  * readerFeatures): a commit whose effects would make a feature-blind
  * reader return WRONG rows (deletion vectors, column mapping) stamps
  * the reader feature into latest-wins meta in the SAME commit, and
  * every log replay ([[SnapshotStore.state]] — the funnel under every
  * read path) refuses a table demanding an unimplemented feature
  * BEFORE planning anything. Replaces the code-path-dependent guard
  * (dv used to refuse only at scan execution when RewriteDvReads was
  * absent) with a durable gate that also covers every FUTURE feature.
  */
class SnapshotProtocolSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(tag: String): String =
    "file:" + java.nio.file.Files
      .createTempDirectory(s"graft-proto-$tag").toString + "/t"

  private def seed(t: String): Unit =
    SnapshotStore.append((1L to 20L).map(i => (i, i * 10L, s"u${i % 4}"))
      .toDF("id", "score", "user").coalesce(1), t, statsCols = Seq("id"))

  test("feature-less tables carry no protocol meta and replay unchanged") {
    val t = freshTable("plain")
    seed(t)
    val meta = SnapshotStore.state(spark, t).meta
    assert(!meta.contains(SnapshotStore.MinReaderKey))
    assert(!meta.contains(SnapshotStore.ReaderFeaturesKey))
    assert(SnapshotStore.snapshot(spark, t).count() === 20L)
  }

  test("merge-on-read delete stamps deletionVectors in the same commit") {
    val t = freshTable("dv")
    seed(t)
    SnapshotStore.setDvEnabled(spark, t, enabled = true)
    val v0 = SnapshotStore.latestVersion(spark, t)
    SnapshotStore.delete(spark, t, col("id") <= 5L)
    val meta = SnapshotStore.state(spark, t).meta
    assert(meta(SnapshotStore.ReaderFeaturesKey) === "deletionVectors")
    assert(meta(SnapshotStore.MinReaderKey) ===
      SnapshotStore.SupportedReaderVersion.toString)
    // the stamp rides THE dv commit, not a separate one
    assert(SnapshotStore.latestVersion(spark, t) === v0 + 1)
    // this build implements the feature: reads stay green
    assert(SnapshotStore.snapshot(spark, t).count() === 15L)
    // features are monotone: a later plain append must not erase them
    SnapshotStore.append(Seq((21L, 210L, "u1")).toDF("id", "score", "user"), t)
    assert(SnapshotStore.state(spark, t).meta(SnapshotStore.ReaderFeaturesKey)
      === "deletionVectors")
  }

  test("rename stamps columnMapping; stamps UNION with existing features") {
    val t = freshTable("map")
    seed(t)
    SnapshotStore.setDvEnabled(spark, t, enabled = true)
    SnapshotStore.delete(spark, t, col("id") <= 5L)
    SnapshotStore.renameColumn(spark, t, "score", "points")
    val meta = SnapshotStore.state(spark, t).meta
    assert(meta(SnapshotStore.ReaderFeaturesKey) ===
      "columnMapping,deletionVectors", "sorted union, latest-wins safe")
    assert(SnapshotStore.snapshot(spark, t).columns.contains("points"))
  }

  test("unknown reader feature refuses at state(), not at scan") {
    val t = freshTable("future")
    seed(t)
    val v = SnapshotStore.latestVersion(spark, t)
    // forge what a future writer would publish: a feature this build
    // has never heard of, alongside one it has
    SnapshotStore.commit(spark, t, adds = Nil, removes = Nil,
      meta = Map("op" -> "future_op",
        SnapshotStore.ReaderFeaturesKey -> "deletionVectors,vectorIndexMirror"),
      mustBeLive = Nil)
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.state(spark, t)
    }
    assert(e.getMessage.contains("vectorIndexMirror"))
    assert(!e.getMessage.contains("deletionVectors,"),
      "only the UNIMPLEMENTED features belong in the refusal")
    // every read path shares the replay funnel
    intercept[IllegalArgumentException] { SnapshotStore.snapshot(spark, t) }
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.v2.SnapshotCatalog].getName)
    val sqlErr = intercept[Throwable] {
      spark.sql(s"SELECT count(*) FROM graft.`$t`").collect()
    }
    assert(sqlErr.getMessage.contains("vectorIndexMirror") ||
      Option(sqlErr.getCause).exists(_.getMessage.contains("vectorIndexMirror")))
    // time travel BEFORE the feature commit replays only meta <= asOf:
    // old snapshots of an upgraded table stay readable
    assert(SnapshotStore.snapshot(spark, t, Some(v)).count() === 20L)
  }

  test("CHECK constraints stamp a WRITER feature only — readers unaffected") {
    val t = freshTable("wf")
    seed(t)
    SnapshotStore.addConstraint(spark, t, "pos_score", "score > 0")
    val meta = SnapshotStore.state(spark, t).meta
    assert(meta(SnapshotStore.WriterFeaturesKey) === "checkConstraints")
    assert(meta(SnapshotStore.MinWriterKey) ===
      SnapshotStore.SupportedWriterVersion.toString)
    assert(!meta.contains(SnapshotStore.ReaderFeaturesKey),
      "constraints don't change read semantics — old readers keep reading")
    // this build implements it: writes keep flowing (and keep enforcing)
    SnapshotStore.append(Seq((21L, 210L, "u1")).toDF("id", "score", "user"), t)
    assert(SnapshotStore.snapshot(spark, t).count() === 21L)
  }

  test("unknown WRITER feature: table stays readable, commits refuse") {
    val t = freshTable("wfuture")
    seed(t)
    SnapshotStore.commit(spark, t, adds = Nil, removes = Nil,
      meta = Map("op" -> "future_op",
        SnapshotStore.WriterFeaturesKey -> "checkConstraints,rowTracking"),
      mustBeLive = Nil)
    // reads: fully functional (the whole point of the reader/writer split)
    assert(SnapshotStore.snapshot(spark, t).count() === 20L)
    // writes: refused loudly, nothing lands
    val v = SnapshotStore.latestVersion(spark, t)
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.append(Seq((21L, 210L, "u1")).toDF("id", "score", "user"), t)
    }
    assert(e.getMessage.contains("rowTracking"))
    assert(SnapshotStore.latestVersion(spark, t) === v)
    // a DML (replaying commit path) refuses too
    intercept[IllegalArgumentException] {
      SnapshotStore.delete(spark, t, col("id") <= 5L)
    }
    assert(SnapshotStore.snapshot(spark, t).count() === 20L)
  }

  test("future minWriterVersion: readable, unwritable") {
    val t = freshTable("wver")
    seed(t)
    SnapshotStore.commit(spark, t, adds = Nil, removes = Nil,
      meta = Map("op" -> "future_op", SnapshotStore.MinWriterKey -> "99"),
      mustBeLive = Nil)
    assert(SnapshotStore.snapshot(spark, t).count() === 20L)
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.append(Seq((21L, 210L, "u1")).toDF("id", "score", "user"), t)
    }
    assert(e.getMessage.contains("99"))
  }

  test("future minReaderVersion refuses loudly") {
    val t = freshTable("ver")
    seed(t)
    SnapshotStore.commit(spark, t, adds = Nil, removes = Nil,
      meta = Map("op" -> "future_op", SnapshotStore.MinReaderKey -> "99"),
      mustBeLive = Nil)
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.state(spark, t)
    }
    assert(e.getMessage.contains("99") &&
      e.getMessage.contains(SnapshotStore.SupportedReaderVersion.toString))
  }

  test("a plain append losing its race to a feature-introducing commit re-checks the gate on retry") {
    val t = freshTable("wrace")
    seed(t)
    val prev = spark.conf.getOption(LogStore.ConfKey)
    spark.conf.set(LogStore.ConfKey, classOf[FeatureRaceLogStore].getName)
    try {
      FeatureRaceLogStore.armFor.set(t)
      // the append's FIRST attempt passes the gate (no features yet),
      // then loses its putIfAbsent to the injected rowTracking commit;
      // the retry's target version advanced → the gate must re-run and
      // refuse, not let an oblivious writer slide past the new feature
      val e = intercept[IllegalArgumentException] {
        SnapshotStore.append(Seq((21L, 210L, "u1"))
          .toDF("id", "score", "user"), t)
      }
      assert(e.getMessage.contains("rowTracking"), e.getMessage)
      assert(SnapshotStore.state(spark, t).meta("op") === "feature_race",
        "only the injected feature commit may land")
      assert(SnapshotStore.snapshot(spark, t).count() === 20L)
    } finally {
      FeatureRaceLogStore.armFor.set(null)
      prev match {
        case Some(p) => spark.conf.set(LogStore.ConfKey, p)
        case None => spark.conf.unset(LogStore.ConfKey)
      }
    }
  }
}

/** Test double for the retry-gate race: the FIRST putIfAbsent against
  * the armed table first lands a real feature-introducing commit at
  * that very version (through the normal commit path, so it carries a
  * valid footer), then lets the caller's publish lose — forcing the
  * deterministic interleaving the gate's retry re-check exists for.
  */
class FeatureRaceLogStore extends RenameLogStore {
  override def putIfAbsent(conf: org.apache.hadoop.conf.Configuration,
                           dir: org.apache.hadoop.fs.Path,
                           target: org.apache.hadoop.fs.Path,
                           payload: Array[Byte]): Boolean = {
    val armed = FeatureRaceLogStore.armFor.get()
    if (armed != null && dir.toString.contains(armed.stripPrefix("file:")) &&
        FeatureRaceLogStore.armFor.compareAndSet(armed, null)) {
      SnapshotStore.commit(
        org.apache.spark.sql.SparkSession.active, armed, adds = Nil,
        removes = Nil,
        meta = Map("op" -> "feature_race",
          SnapshotStore.WriterFeaturesKey -> "rowTracking"),
        mustBeLive = Nil)
    }
    super.putIfAbsent(conf, dir, target, payload)
  }
}

object FeatureRaceLogStore {
  /** Table path to inject against; nulled after the one injection. */
  val armFor = new java.util.concurrent.atomic.AtomicReference[String](null)
}
