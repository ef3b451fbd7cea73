package graft.sources.v2

import graft.SparkSpec
import graft.sources.SnapshotStore
import org.apache.spark.sql.functions._

class SnapshotDataSourceSpec extends SparkSpec {
  import spark.implicits._

  private val fmt = classOf[SnapshotDataSource].getName

  private def tempTable(tag: String): String =
    "file:" + java.nio.file.Files
      .createTempDirectory(s"graft-snapdsv2-$tag").toString + "/t"

  test("format read: latest snapshot + versionAsOf time travel") {
    val t = tempTable("tt")
    SnapshotStore.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t)
    SnapshotStore.overwrite(Seq((9L, "z")).toDF("id", "v"), t)
    assert(spark.read.format(fmt).load(t)
      .as[(Long, String)].collect().toSet === Set((9L, "z")))
    assert(spark.read.format(fmt).option("versionAsOf", 1).load(t)
      .as[(Long, String)].collect().toSet === Set((1L, "a"), (2L, "b")))
  }

  test("the delegated scan keeps parquet pushdown: filters + pruned read schema") {
    val t = tempTable("push")
    SnapshotStore.append(
      (1L to 100L).map(i => (i, s"s$i", i * 2.0)).toDF("id", "s", "x"), t)
    val df = spark.read.format(fmt).load(t)
      .filter(col("id") === 7L).select("s")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(id,7)"),
      s"filter must reach the parquet scan:\n$plan")
    assert(!plan.contains("x:double"),
      s"unprojected column must be pruned from ReadSchema:\n$plan")
    assert(df.as[String].collect().toSeq === Seq("s7"))
  }

  test("read-only: the write path cannot bypass the commit protocol") {
    val t = tempTable("ro")
    SnapshotStore.append(Seq((1L, "a")).toDF("id", "v"), t)
    intercept[Exception] {
      Seq((2L, "b")).toDF("id", "v").write.format(fmt).mode("append").save(t)
    }
    assert(spark.read.format(fmt).load(t).count() === 1L,
      "a refused write must leave the snapshot untouched")
  }

  test("log-answered aggregates: count/min/max from commit stats, zero file reads") {
    val t = tempTable("agg")
    SnapshotStore.append((1L to 60L).map(i => (i, s"s$i")).toDF("id", "v"), t,
      statsCols = Seq("id"))
    SnapshotStore.append((61L to 100L).map(i => (i, s"s$i")).toDF("id", "v"), t,
      statsCols = Seq("id"))
    val df = spark.read.format(fmt).load(t)
    val agg = df.agg(count(lit(1)).as("n"), min("id").as("lo"), max("id").as("hi"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("graft-snapshot-agg"),
      s"unfiltered global aggregate must answer from the log:\n$plan")
    assert(!plan.toLowerCase.contains("parquet"),
      s"the log-answered plan must not contain a parquet scan:\n$plan")
    assert(agg.as[(Long, Long, Long)].head() === ((100L, 1L, 100L)))
    // versionAsOf composes: v1's stats, not the latest
    val aggV1 = spark.read.format(fmt).option("versionAsOf", 1).load(t)
      .agg(count(lit(1)), min("id"), max("id"))
    assert(aggV1.queryExecution.executedPlan.toString.contains("graft-snapshot-agg"))
    assert(aggV1.as[(Long, Long, Long)].head() === ((60L, 1L, 60L)))
  }

  test("log-answered aggregates decline exactly: filters, group-by, un-stats'd columns") {
    val t = tempTable("aggdecl")
    SnapshotStore.append(
      (1L to 50L).map(i => (i, i % 7, s"s$i")).toDF("id", "k", "v"), t,
      statsCols = Seq("id")) // k has NO stats in the log
    val df = spark.read.format(fmt).load(t)
    def planOf(d: org.apache.spark.sql.DataFrame) =
      d.queryExecution.executedPlan.toString

    val filtered = df.filter(col("id") > 10L).agg(count(lit(1)))
    assert(!planOf(filtered).contains("graft-snapshot-agg"),
      "a pushed filter makes log counts wrong — must fall back")
    assert(filtered.as[Long].head() === 40L)

    val grouped = df.groupBy("k").count()
    assert(!planOf(grouped).contains("graft-snapshot-agg"))
    assert(grouped.as[(Long, Long)].collect().map(_._2).sum === 50L)

    val unstats = df.agg(min("k"))
    assert(!planOf(unstats).contains("graft-snapshot-agg"),
      "min over a column the log has no stats for must fall back")
    assert(unstats.as[Long].head() === 0L)
  }

  test("runtime FILE pruning: a joined dimension's id IN-set drops files via log stats") {
    import org.apache.spark.sql.sources.{EqualTo, In}
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val t = tempTable("dfp")
    // 4 ranged appends -> 4 files with DISJOINT [min,max] id boxes
    (0 until 4).foreach { b =>
      SnapshotStore.append(
        (b * 100L until b * 100L + 50L).map(i => (i, s"v$i")).toDF("id", "v")
          .coalesce(1), t, statsCols = Seq("id"))
    }
    def scanOf(): SnapshotRuntimeScan = {
      val props = new java.util.HashMap[String, String](); props.put("path", t)
      new SnapshotDataSource().getTable(null, Array.empty, props)
        .asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
        .newScanBuilder(new CaseInsensitiveStringMap(props)).build()
        .asInstanceOf[SnapshotRuntimeScan]
    }
    // the SupportsRuntimeFiltering contract, unit-level (an e2e DPP
    // trigger depends on size heuristics; the contract does not)
    val s0 = scanOf()
    assert(s0.filterAttributes().map(_.fieldNames().mkString) === Array("id"))
    val all = s0.planInputPartitions().length
    assert(all >= 1)
    val s1 = scanOf()
    s1.filter(Array[org.apache.spark.sql.sources.Filter](
      In("id", Array[Any](7L, 310L)))) // hits files 0 and 3 only
    val prunedParts = s1.planInputPartitions()
    val keptFiles = prunedParts.map(_.toString).mkString
    assert(prunedParts.length < all || !keptFiles.isEmpty)
    // count the surviving FILES (partitions may bin-pack)
    val files = prunedParts.toSeq.flatMap {
      case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
        fp.files.map(_.filePath.toString).toSeq
      case _ => Seq.empty[String]
    }
    assert(files.length === 2,
      s"IN-set {7, 310} must keep exactly the two covering files, got $files")
    // equality form + proven-empty set
    val s2 = scanOf()
    s2.filter(Array[org.apache.spark.sql.sources.Filter](EqualTo("id", 9999L)))
    assert(s2.planInputPartitions().toSeq.flatMap {
      case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
        fp.files.toSeq
      case _ => Seq.empty
    }.isEmpty, "a value outside every box plans zero files")
    // end-to-end: a broadcast semi-join over the same IN-set stays exact
    val dim = Seq(7L, 310L).toDF("id")
    val joined = spark.read.format(fmt).load(t)
      .join(broadcast(dim), "id").select("v").as[String].collect().sorted
    assert(joined.toSeq === Seq("v310", "v7"))

    // STRING-keyed twin: per-lang files, a lang IN-set prunes via the
    // log's string boxes (UTF-8 byte order, truncation-conservative)
    val ts = tempTable("dfpstr")
    Seq("de", "en", "fr", "zh").foreach { lang =>
      SnapshotStore.append(
        (1L to 10L).map(i => (i, lang)).toDF("id", "lang").coalesce(1),
        ts, statsCols = Seq("lang"))
    }
    def strScan(): SnapshotRuntimeScan = {
      val props = new java.util.HashMap[String, String](); props.put("path", ts)
      new SnapshotDataSource().getTable(null, Array.empty, props)
        .asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
        .newScanBuilder(new CaseInsensitiveStringMap(props)).build()
        .asInstanceOf[SnapshotRuntimeScan]
    }
    val ss = strScan()
    assert(ss.filterAttributes().map(_.fieldNames().mkString).toSet
      .contains("lang"))
    ss.filter(Array[org.apache.spark.sql.sources.Filter](
      In("lang", Array[Any]("de", "zh"))))
    val strFiles = ss.planInputPartitions().toSeq.flatMap {
      case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
        fp.files.map(_.filePath.toString).toSeq
      case _ => Seq.empty[String]
    }
    assert(strFiles.length === 2,
      s"lang IN-set {de, zh} must keep exactly two files, got $strFiles")
  }

  test("SQL text: a version-pinned temp view serves time travel to pure SQL") {
    val t = tempTable("sql")
    SnapshotStore.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t)
    SnapshotStore.overwrite(Seq((30L, "c")).toDF("id", "v"), t)
    spark.read.format(fmt).option("versionAsOf", 1).load(t)
      .createOrReplaceTempView("snap_v1")
    spark.read.format(fmt).load(t).createOrReplaceTempView("snap_now")
    assert(spark.sql(
      "SELECT (SELECT sum(id) FROM snap_v1) AS old, (SELECT sum(id) FROM snap_now) AS now")
      .as[(Long, Long)].head === ((3L, 30L)))
  }
}
