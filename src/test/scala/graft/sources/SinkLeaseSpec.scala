package graft.sources

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The writer lease that makes the dedup sinks' single-writer
  * assumption ENFORCEABLE: maintenance and sink batches exclude each
  * other deterministically, BEFORE staging, instead of racing to an
  * optimistic mid-batch commit conflict.
  */
class SinkLeaseSpec extends SparkSpec {
  import spark.implicits._

  private def dir(tag: String): String = "file:" +
    java.nio.file.Files.createTempDirectory(s"graft-lease-$tag").toString

  test("acquire/release round-trips; a held lease refuses a second acquirer with the holder's role") {
    val p = dir("rt")
    val l = SinkLease.acquire(spark, p, "sink")
    val h = SinkLease.holder(spark, p)
    assert(h.exists { case (holder, role, _) => holder == l.holder && role == "sink" }, h)
    val ex = intercept[IllegalStateException] {
      SinkLease.acquire(spark, p, "maintenance")
    }
    assert(ex.getMessage.contains("held by role 'sink'"), ex.getMessage)
    assert(ex.getMessage.contains("refused before staging"), ex.getMessage)
    SinkLease.release(spark, l)
    assert(SinkLease.holder(spark, p).isEmpty)
    // free path: the next acquirer (other role) succeeds immediately
    val l2 = SinkLease.acquire(spark, p, "maintenance")
    SinkLease.release(spark, l2)
  }

  test("an expired lease is steal-able; the crashed holder's late release is a no-op") {
    val p = dir("ttl")
    val crashed = SinkLease.acquire(spark, p, "sink", ttlMs = 50L)
    Thread.sleep(80L)
    // past TTL: a new acquirer steals instead of being refused
    val stolen = SinkLease.acquire(spark, p, "maintenance")
    assert(SinkLease.holder(spark, p)
      .exists { case (h, r, _) => h == stolen.holder && r == "maintenance" })
    // the crashed holder waking up must NOT clobber the stealer
    SinkLease.release(spark, crashed)
    assert(SinkLease.holder(spark, p)
      .exists { case (h, _, _) => h == stolen.holder })
    SinkLease.release(spark, stolen)
    assert(SinkLease.holder(spark, p).isEmpty)
  }

  test("the lease log prunes: thousands of batch acquire/release cycles keep O(1) entries") {
    val p = dir("prune")
    (1 to 40).foreach { _ =>
      SinkLease.release(spark, SinkLease.acquire(spark, p, "sink"))
    }
    val fs = new org.apache.hadoop.fs.Path(p, "_lease")
      .getFileSystem(spark.sessionState.newHadoopConf())
    val n = fs.listStatus(new org.apache.hadoop.fs.Path(p, "_lease")).length
    assert(n <= 10, s"lease log must stay bounded, found $n entries")
  }

  test("CALL graft.dedup_sink_maintain is refused BEFORE staging while a sink batch holds the lease") {
    graft.plans.GraftExtensions.register(spark)
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.v2.SnapshotCatalog].getName)
    val p = dir("proc")
    // seed a sink-shaped store fragmented enough that maintenance
    // WOULD rewrite it if it got past the lease
    (1 to 4).foreach { i =>
      SnapshotStore.append(
        Seq((i.toLong, true)).toDF("doc_id", "keep").coalesce(1),
        s"$p/verdicts", statsCols = Seq("doc_id"), bloomCols = Seq("doc_id"))
    }
    val vBefore = SnapshotStore.latestVersion(spark, s"$p/verdicts")
    val sinkLease = SinkLease.acquire(spark, p, "sink")
    val ex = intercept[Exception] {
      spark.sql(s"CALL graft.dedup_sink_maintain('$p', 'doc_id', 1)").collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(t => t.getMessage != null &&
      t.getMessage.contains("held by role 'sink'")),
      causes(ex).map(_.getMessage).mkString(" | "))
    // refused before staging: zero version churn on the store
    assert(SnapshotStore.latestVersion(spark, s"$p/verdicts") === vBefore)
    SinkLease.release(spark, sinkLease)
    // lease released: the same CALL now compacts
    val row = spark.sql(s"CALL graft.dedup_sink_maintain('$p', 'doc_id', 1)")
      .collect().head
    assert(row.getAs[String]("rewritten") === "verdicts")
    assert(row.getAs[Int]("files_after") === 1)
    // and the proc released ITS lease on the way out
    assert(SinkLease.holder(spark, p).isEmpty)
  }

  test("a sink micro-batch is refused up front while maintenance holds the lease, and proceeds after release") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.streaming.StreamingQueryException
    val p = dir("sink")
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    val maint = SinkLease.acquire(spark, p, "maintenance")
    val mem = MemoryStream[(Long, String)]
    val q1 = graft.streaming.Streaming.incrementalDedupSink(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", p).start()
    val ex = intercept[StreamingQueryException] {
      mem.addData((1L, "alpha beta gamma delta epsilon zeta eta"))
      q1.processAllAvailable()
    }
    q1.stop()
    assert(causes(ex).exists(t => t.getMessage != null &&
      t.getMessage.contains("held by role 'maintenance'")),
      causes(ex).map(_.getMessage).mkString(" | "))
    // nothing staged or committed by the refused batch
    assert(SnapshotStore.latestVersion(spark, s"$p/verdicts") === 0L)
    SinkLease.release(spark, maint)
    // restart: the replayed batch now commits normally
    val q2 = graft.streaming.Streaming.incrementalDedupSink(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", p).start()
    try {
      mem.addData((2L, "one two three four five six seven eight"))
      q2.processAllAvailable()
      val ids = SnapshotStore.snapshot(spark, s"$p/verdicts")
        .select("doc_id").as[Long].collect().toSet
      assert(ids.contains(2L), s"got $ids")
      // the sink released its per-batch lease at batch end
      assert(SinkLease.holder(spark, p).isEmpty)
    } finally q2.stop()
  }
}
