package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The bitmap-masked dv read path: per-file Roaring64 position bitmaps
  * ride a broadcast and each scan row tests membership MAP-SIDE
  * ([[graft.plans.DvMasked]]) — zero exchange, whole-stage codegen
  * intact. Replaces the positional anti-join, which shuffled O(table)
  * data rows past the broadcast cap: measured at 30% deleted of 8M rows
  * across 64 files, scan overhead vs a purged baseline fell 15.8× →
  * 1.3×. The durable dv format is UNCHANGED (plain (file,pos) parquet —
  * vacuum/CDF/time travel keep their row-level view); bitmaps are a
  * read-side representation, cached per immutable dataset.
  */
class SnapshotDvBitmapSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(tag: String): String =
    "file:" + java.nio.file.Files
      .createTempDirectory(s"graft-dvbm-$tag").toString + "/t"

  private def seed(t: String, n: Long = 1000L): Unit = {
    SnapshotStore.append((1L to n).map(i => (i, i * 10L, s"u${i % 4}"))
      .toDF("id", "score", "user").repartition(4), t, statsCols = Seq("id"))
    SnapshotStore.setDvEnabled(spark, t, enabled = true)
  }

  test("dv read is a map-side bitmap mask inside codegen — no join, exact rows") {
    val t = freshTable("plan")
    seed(t)
    SnapshotStore.delete(spark, t, col("id") % 10L < 3L) // 30%, every file
    val df = SnapshotStore.snapshot(spark, t)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dv_masked"), s"expected the bitmap mask in:\n$plan")
    assert(!plan.contains("LeftAnti"), "the anti-join form must be gone")
    // the mask rides INSIDE whole-stage codegen (a starred Filter)
    assert("\\*\\(\\d+\\) Filter".r.findFirstIn(plan).isDefined,
      s"masked filter must stay codegen'd:\n$plan")
    // exactness: visible rows = ids with id%10 >= 3
    assert(df.count() === (1L to 1000L).count(_ % 10 >= 3))
    assert(df.agg(sum(col("id"))).head.getLong(0) ===
      (1L to 1000L).filter(_ % 10 >= 3).sum)
  }

  test("bitmap broadcast caches per immutable dataset") {
    val t = freshTable("cache")
    seed(t)
    SnapshotStore.delete(spark, t, col("id") <= 100L)
    val dir = SnapshotStore.state(spark, t).live
      .flatMap(_.dv.map(_._1)).distinct match { case Seq(d) => d }
    val b1 = SnapshotStore.dvBitmapBroadcast(spark, dir)
    val b2 = SnapshotStore.dvBitmapBroadcast(spark, dir)
    assert(b1.isDefined && (b1.get eq b2.get),
      "the same dataset must reuse ONE broadcast, not rebuild per read")
    // a second delete creates a NEW dataset (pointers move, content
    // never mutates) — reads pick up the union through the new bitmaps
    SnapshotStore.delete(spark, t, col("id") > 900L)
    val dirs2 = SnapshotStore.state(spark, t).live.flatMap(_.dv.map(_._1)).distinct
    assert(dirs2 != Seq(dir), "a later delete must repoint, not mutate")
    assert(SnapshotStore.snapshot(spark, t).count() === 800L)
  }

  test("over-cap datasets fall back to the positional anti-join, same rows") {
    val t = freshTable("cap")
    seed(t)
    spark.conf.set("graft.dv.bitmapMaxBytes", "1")
    try {
      SnapshotStore.delete(spark, t, col("id") % 10L < 3L)
      val df = SnapshotStore.snapshot(spark, t)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("dv_masked"), "over-cap must not broadcast bitmaps")
      assert(plan.contains("LeftAnti"), s"expected the anti-join fallback in:\n$plan")
      assert(df.count() === (1L to 1000L).count(_ % 10 >= 3))
      assert(df.agg(sum(col("id"))).head.getLong(0) ===
        (1L to 1000L).filter(_ % 10 >= 3).sum)
    } finally spark.conf.unset("graft.dv.bitmapMaxBytes")
  }

  test("raising the bitmap cap mid-session re-attempts the bitmap path (no stale over-cap verdict)") {
    val t = freshTable("recap")
    seed(t)
    SnapshotStore.delete(spark, t, col("id") <= 100L)
    val dir = SnapshotStore.state(spark, t).live
      .flatMap(_.dv.map(_._1)).distinct match { case Seq(d) => d }
    spark.conf.set("graft.dv.bitmapMaxBytes", "1")
    try {
      assert(SnapshotStore.dvBitmapBroadcast(spark, dir).isEmpty,
        "a 1-byte cap must refuse the bitmap")
      // the over-cap verdict is keyed by the EFFECTIVE cap: raising it
      // must rebuild and broadcast, not replay the cached None
      spark.conf.set("graft.dv.bitmapMaxBytes", (256L << 20).toString)
      assert(SnapshotStore.dvBitmapBroadcast(spark, dir).isDefined,
        "a raised cap must re-attempt the bitmap path for the same dataset")
    } finally spark.conf.unset("graft.dv.bitmapMaxBytes")
  }

  test("SQL catalog and DSv2 reads go through the mask; time travel exact") {
    val t = freshTable("sql")
    seed(t)
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.v2.SnapshotCatalog].getName)
    val v = SnapshotStore.delete(spark, t, col("id") <= 250L)
    assert(spark.sql(s"SELECT sum(score) FROM graft.`$t`").head.getLong(0) ===
      (251L to 1000L).map(_ * 10L).sum)
    assert(spark.read.format("graft.sources.v2.SnapshotDataSource").load(t)
      .count() === 750L)
    assert(SnapshotStore.snapshot(spark, t, Some(v - 2)).count() === 1000L)
  }
}
