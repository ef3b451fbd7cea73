package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** NULL-COUNT file statistics — the third leg of the stats triple
  * (rows, [min,max], nulls — Delta's nullCount): harvested from parquet
  * footers at commit time, type-agnostic. Feeds (a) index-only
  * `count(col)` = Σ(rows − nulls) through the DSv2 aggregate pushdown,
  * and (b) ALL-NULL file pruning — such files have NO min/max stats, so
  * the range legs could never skip them, yet no row can satisfy a range
  * or equality predicate.
  */
class SnapshotNullStatsSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(tag: String): String =
    "file:" + java.nio.file.Files
      .createTempDirectory(s"graft-nullstats-$tag").toString + "/t"

  test("null counts harvest per file and survive the log roundtrip") {
    val t = freshTable("harvest")
    val df = (1L to 10L).map(i =>
      (i, if (i % 2 == 0) Some(i * 10L) else None, s"s$i")).toDF("id", "v", "s")
    SnapshotStore.append(df, t, statsCols = Seq("id", "v", "s"))
    val live = SnapshotStore.state(spark, t).live
    assert(live.map(_.nulls.getOrElse("v", -1L)).sum === 5L,
      "half the v values are null")
    assert(live.forall(_.nulls.get("id").contains(0L)))
    assert(live.forall(_.nulls.get("s").contains(0L)),
      "null counts must land for STRING columns too (type-agnostic leg)")
  }

  test("count(col) answers from the log: IndexAggScan, exact non-null count") {
    val t = freshTable("agg")
    val df = (1L to 100L).map(i =>
      (i, if (i % 4 == 0) Some(s"lang${i % 3}") else None)).toDF("id", "lang")
    SnapshotStore.append(df.filter(col("id") <= 50L), t, statsCols = Seq("id", "lang"))
    SnapshotStore.append(df.filter(col("id") > 50L), t, statsCols = Seq("id", "lang"))
    val read = spark.read.format("graft.sources.v2.SnapshotDataSource").load(t)
      .agg(count(lit(1)).as("n"), count(col("lang")).as("n_lang"),
        min(col("id")).as("min_id"))
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("graft-snapshot-agg"),
      s"count(col) with full null-count coverage must answer from the log:\n$plan")
    val row = read.head()
    assert(row.getLong(0) === 100L)
    assert(row.getLong(1) === 25L)
    assert(row.getLong(2) === 1L)
  }

  test("count(col) declines to a real scan when a file lacks the null count") {
    val t = freshTable("decline")
    // first append harvests no stats for lang → its files carry no null
    // count → the log cannot prove the answer and must decline
    SnapshotStore.append((1L to 10L).map(i => (i, s"l$i")).toDF("id", "lang"),
      t, statsCols = Seq("id"))
    SnapshotStore.append((11L to 20L).map(i => (i, s"l$i")).toDF("id", "lang"),
      t, statsCols = Seq("id", "lang"))
    val read = spark.read.format("graft.sources.v2.SnapshotDataSource").load(t)
      .agg(count(col("lang")).as("n_lang"))
    assert(!read.queryExecution.executedPlan.toString.contains("graft-snapshot-agg"),
      "partial null-count coverage must decline the log answer")
    assert(read.head().getLong(0) === 20L, "the fallback scan is still exact")
  }

  test("all-null files prune from box and point reads (no min/max could skip them)") {
    val t = freshTable("prune")
    // file A: ids 1..10 with real v values; file B: v entirely NULL —
    // parquet writes NO min/max for an all-null column, so only the
    // null-count leg can prove absence
    SnapshotStore.append((1L to 10L).map(i => (i, Some(i * 10L))).toDF("id", "v")
      .coalesce(1), t, statsCols = Seq("id", "v"))
    SnapshotStore.append((11L to 20L).map(i => (i, None: Option[Long])).toDF("id", "v")
      .coalesce(1), t, statsCols = Seq("id", "v"))
    val live = SnapshotStore.state(spark, t).live
    assert(live.exists(a => a.nulls.get("v").contains(a.rows)),
      "the all-null file must record nulls == rows")
    val (kept, total) = SnapshotStore.prunedLiveFiles(spark, t,
      box = Map("v" -> (0L, 1000L)))
    assert(total === 2 && kept.size === 1,
      s"the all-null file must prune from the v-box read: kept $kept")
    assert(SnapshotStore.readBox(spark, t, Map("v" -> (0L, 1000L)))
      .count() === 10L)
    // equality probes skip it too
    assert(SnapshotStore.readPoints(spark, t, "v", Seq(50L))
      .select("id").as[Long].collect().toSeq === Seq(5L))
  }

  test("rename re-keys and drop forgets the null counts with the other stats") {
    val t = freshTable("rename")
    val df = (1L to 6L).map(i =>
      (i, if (i % 2 == 0) Some(i) else None)).toDF("id", "v")
    SnapshotStore.append(df, t, statsCols = Seq("id", "v"))
    SnapshotStore.renameColumn(spark, t, "v", "w")
    val live = SnapshotStore.state(spark, t).live
    assert(live.map(_.nulls.getOrElse("w", -1L)).sum === 3L,
      "rename must re-key the null counts")
    assert(live.forall(!_.nulls.contains("v")))
    SnapshotStore.dropColumn(spark, t, "w")
    assert(SnapshotStore.state(spark, t).live.forall(!_.nulls.contains("w")),
      "drop must forget the null counts")
  }
}
