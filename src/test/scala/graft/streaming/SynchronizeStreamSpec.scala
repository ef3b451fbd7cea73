package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.Streaming._

/** `transformWithState` requires the RocksDB state store provider, so
  * this suite runs on an ISOLATED child session (`newSession()` shares
  * the SparkContext but carries its own SQLConf) — the shared test
  * session keeps the default HDFS-backed provider.
  */
class SynchronizeStreamSpec extends SparkSpec {

  private lazy val rocks = {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s
  }

  test("synchronizeStream aligns multiple topics on one grid across batches") {
    val s = rocks
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[EventRow]
    val q = Streaming.synchronizeStream(mem.toDS(), Seq("speed", "heading"), stepUs = 10L)
      .writeStream.format("memory").queryName("sync_grid")
      .outputMode("append").start()
    try {
      mem.addData(
        EventRow(1L, 3L, "speed", 1.0),
        EventRow(1L, 7L, "heading", 90.0),
        EventRow(1L, 10L, "speed", 2.0), // lands exactly ON the tick
        EventRow(1L, 12L, "noise", -1.0)) // not a topic: ignored entirely
      q.processAllAvailable()
      mem.addData(EventRow(1L, 31L, "heading", 180.0))
      q.processAllAvailable()
      val rows = s.table("sync_grid")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getMap[String, Double](2).toMap))
        .sortBy(_._2)
      // tick 10: speed=2 (event AT the tick included), heading=90 —
      // proven final by the ts=31 event; ticks 20, 30 forward-fill
      assert(rows.toSeq == Seq(
        (1L, 10L, Map("speed" -> 2.0, "heading" -> 90.0)),
        (1L, 20L, Map("speed" -> 2.0, "heading" -> 90.0)),
        (1L, 30L, Map("speed" -> 2.0, "heading" -> 90.0))))
    } finally q.stop()
  }

  test("synchronizeStream: topics absent before their first event; state survives batches") {
    val s = rocks
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[EventRow]
    val q = Streaming.synchronizeStream(mem.toDS(), Seq("a", "b"), stepUs = 100L)
      .writeStream.format("memory").queryName("sync_grid2")
      .outputMode("append").start()
    try {
      mem.addData(EventRow(7L, 50L, "a", 1.0))
      q.processAllAvailable()
      mem.addData(EventRow(7L, 250L, "b", 2.0))
      q.processAllAvailable()
      mem.addData(EventRow(7L, 450L, "a", 3.0))
      q.processAllAvailable()
      val rows = s.table("sync_grid2")
        .collect()
        .map(r => (r.getLong(1), r.getMap[String, Double](2).toMap))
        .sortBy(_._1)
      assert(rows.toSeq == Seq(
        (100L, Map("a" -> 1.0)),            // b not seen yet → absent
        (200L, Map("a" -> 1.0)),
        (300L, Map("a" -> 1.0, "b" -> 2.0)),
        (400L, Map("a" -> 1.0, "b" -> 2.0))))
    } finally q.stop()
  }
}
