package graft.sources.v2

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.graftbridge.GraftShim
import org.apache.spark.sql.types.StructType

import graft.sources.SnapshotStore

/** Offsets are commit versions — nothing more. The log is the
  * write-ahead record, so the stream's progress is a single long and
  * replay is exact by construction.
  */
private[v2] case class SnapshotSourceOffset(version: Long) extends Offset {
  override def json: String = version.toString
}

/** Streaming READ of a [[SnapshotStore]] table — the twin of
  * [[SnapshotStore.appendSink]], closing the loop: one job streams
  * results INTO a snapshot table, another streams them OUT, and the
  * commit log is the only coordination between them (Delta's streaming
  * source re-expressed over the v1 `Source` contract, which is the API
  * Delta itself uses — `getBatch` returns a DataFrame, so the scan
  * stays Spark's own vectorized parquet read).
  *
  * Semantics:
  *  - Offsets ARE commit versions. The first batch is the full snapshot
  *    at the then-latest version (or increments past `startingVersion`
  *    when set); every later batch is exactly the files appended in
  *    `(lastCommittedVersion, latestVersion]` — file-level increments,
  *    zero re-reads, zero directory listing (the log is the index).
  *  - Restart replay is exact: versions are deterministic, so a
  *    checkpoint's offset names precisely the files already delivered.
  *  - A rewrite commit (compact/overwrite/restore/upsert) in the range
  *    FAILS the query by default — file-level increments across a
  *    rewrite would re-deliver old rows as new ([[SnapshotStore.addedSince]]'s
  *    documented refusal, surfaced as a stream error instead of silent
  *    duplication). `skipRewrites=true` opts into skipping those
  *    commits (Delta's `skipChangeCommits`): append-only consumption
  *    that tolerates background compaction — sound BECAUSE compaction
  *    is content-preserving; overwrites simply never re-deliver.
  *
  * Options: `startingVersion` (long, or `latest` = tail from stream
  * start), `skipRewrites` (boolean, default false),
  * `maxVersionsPerTrigger` (admission control — a backlogged stream
  * catches up in bounded micro-batches instead of one giant batch, the
  * scale lever Delta spells `maxFilesPerTrigger`; versions are the
  * natural unit here because each commit is one writer batch).
  */
class SnapshotStreamSource(spark: SparkSession, table: String,
                           override val schema: StructType,
                           skipRewrites: Boolean,
                           startingVersion: Option[Long],
                           maxVersionsPerTrigger: Option[Long]) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {

  import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2, ReadLimit}

  private def ver(o: Offset): Long = o.json.trim.toLong

  override def getOffset: Option[Offset] = {
    val v = SnapshotStore.latestVersion(spark, table)
    if (v == 0L) None else Some(SnapshotSourceOffset(v))
  }

  /** Admission control: advance at most `maxVersionsPerTrigger` commits
    * past the last processed offset. A fresh stream with no prior offset
    * either loads the whole snapshot at one version (inherently a single
    * admission unit) or — with `startingVersion` set — replays
    * incrementally from there, so the cap must anchor on
    * `startingVersion` too: without that, the catch-up from an old
    * starting point would arrive as one giant unbounded first batch.
    * MicroBatchExecution prefers this over [[getOffset]] for sources
    * that implement the interface.
    */
  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val latest = SnapshotStore.latestVersion(spark, table)
    if (latest == 0L) return null
    val base = Option(startOffset).map(_.json.trim.toLong).orElse(startingVersion)
    val capped = (base, maxVersionsPerTrigger) match {
      case (Some(s), Some(k)) => math.min(latest, s + k)
      case _ => latest
    }
    SnapshotSourceOffset(capped)
  }

  override def getDefaultReadLimit: ReadLimit =
    maxVersionsPerTrigger.map(k => ReadLimit.maxFiles(k.toInt))
      .getOrElse(ReadLimit.allAvailable())

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = ver(end)
    val files: Seq[String] = start.map(ver).orElse(startingVersion) match {
      case Some(since) =>
        SnapshotStore.addedSince(spark, table, since, Some(endV), skipRewrites)
          .map(_.path)
      case None => // initial load: the whole table as of the first offset
        SnapshotStore.state(spark, table, Some(endV)).live.map(_.path)
    }
    // explicit schema: batches stay column-stable even if later appends
    // widened the parquet footprint; zero files still yields a typed
    // empty file relation (same plan shape, streaming-taggable)
    val batch =
      if (files.isEmpty) spark.read.schema(schema).parquet()
      else spark.read.schema(schema).parquet(files: _*)
    GraftShim.asStreamingRelation(batch)
  }

  override def stop(): Unit = ()
}

object SnapshotStreamSource {
  /** Resolve provider options into a source (schema already fixed by
    * [[SnapshotDataSource.sourceSchema]] at stream definition).
    */
  def apply(spark: SparkSession, parameters: Map[String, String],
            schema: StructType): SnapshotStreamSource = {
    val table = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-snapshot stream requires .load(<table path>)"))
    val skip = parameters.get("skipRewrites").exists(_.toBoolean)
    val starting = parameters.get("startingVersion").map {
      case "latest" => SnapshotStore.latestVersion(spark, table)
      case v => v.toLong
    }
    val maxVersions = parameters.get("maxVersionsPerTrigger").map(_.toLong)
    maxVersions.foreach(k => require(k >= 1,
      s"maxVersionsPerTrigger must be >= 1, got $k"))
    new SnapshotStreamSource(spark, table, schema, skip, starting, maxVersions)
  }
}
