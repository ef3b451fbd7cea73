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
  *  - `readChangeFeed=true` switches the stream to ROW-LEVEL change
  *    batches (Delta CDF's streaming form): every row carries
  *    `_change_type` ('insert'/'delete') and `_commit_version`, the
  *    feed [[SnapshotStore.changes]] reconstructs from the log —
  *    appends surface as inserts, an upsert/delete/overwrite commit
  *    contributes its removed files' rows as deletes and its added
  *    files' rows as inserts (an updated key is a delete+insert pair,
  *    net change exact), and a COMPACTION emits NOTHING (a
  *    content-preserving rewrite has no row-level delta). This is the
  *    mode that stays sound precisely where file-level increments
  *    refuse or skip: downstream sinks apply rows in `_commit_version`
  *    order and mirror the table through arbitrary rewrites. The
  *    initial load (no `startingVersion`) delivers the then-current
  *    snapshot as inserts at its version.
  *
  * Options: `startingVersion` (long, or `latest` = tail from stream
  * start), `skipRewrites` (boolean, default false — append-only
  * consumption), `readChangeFeed` (boolean, default false — row-level
  * change consumption; mutually exclusive with `skipRewrites`),
  * `maxVersionsPerTrigger` (admission control — a backlogged stream
  * catches up in bounded micro-batches instead of one giant batch, the
  * scale lever Delta spells `maxFilesPerTrigger`; versions are the
  * natural unit here because each commit is one writer batch).
  *
  * FAILURE MODE — stalled past the retention window: a follower that
  * stops processing while the table's maintenance keeps compacting and
  * vacuuming (e.g. the dedup sinks at `retainVersions=2`) can resume
  * with a catch-up range whose below-floor append files were vacuumed.
  * The source detects this BEFORE scanning (see [[SnapshotStore.vacuumFloor]])
  * and fails with the recovery recipe: restart with a fresh checkpoint
  * (`startingVersion=latest` to tail only new commits, or no
  * `startingVersion` to reload the whole current snapshot), or widen
  * the window by raising the maintenance side's `retainVersions`.
  */
class SnapshotStreamSource(spark: SparkSession, table: String,
                           override val schema: StructType,
                           skipRewrites: Boolean,
                           startingVersion: Option[Long],
                           maxVersionsPerTrigger: Option[Long],
                           changeFeed: Boolean = false) extends Source
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
    start.map(ver).orElse(startingVersion) match {
      case Some(since) => requireRangeNotVacuumed(since, endV)
      case None => requireSnapshotNotVacuumed(endV)
    }
    if (changeFeed) return getChangeBatch(start, endV)
    val files: Seq[SnapshotStore.AddFile] = start.map(ver).orElse(startingVersion) match {
      case Some(since) =>
        SnapshotStore.addedSince(spark, table, since, Some(endV), skipRewrites)
      case None => // initial load: the whole table as of the first offset
        SnapshotStore.state(spark, table, Some(endV)).live
    }
    // explicit schema: batches stay column-stable even if later appends
    // widened the parquet footprint; zero files still yields a typed
    // empty file relation (same plan shape, streaming-taggable). The
    // read goes through the table's column mapping (physical names are
    // immutable, so the current mapping covers every era's files) and
    // applies deletion vectors (an initial load of a table with
    // merge-on-read deletes must not deliver the deleted rows;
    // increments are append files, which never carry one).
    SnapshotStore.readFilesAsDv(spark, table, schema, files,
      asOf = Some(endV), mark = GraftShim.asStreamingRelation)
  }

  /** Row-level change batch for versions (start, end] — the read-time
    * CDF reconstruction ([[SnapshotStore.changes]]: one parquet scan
    * over the range's referenced files plus a broadcast file-name tag
    * join, compactions contribute nothing). Restart-exact for the same
    * reason the file mode is: versions are deterministic, so a replayed
    * offset range reconstructs the identical change rows.
    */
  private def getChangeBatch(start: Option[Offset], endV: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.types.StructType
    // streaming relations are marked INSIDE the reads (data side only):
    // a deletion-vector'd table's feed contains anti/semi-joins against
    // the static dv-position datasets, and marking those too would plan
    // an unsupported stream-stream join (same contract as getBatch)
    val streamMark: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      GraftShim.asStreamingRelation
    val df = start.map(ver).orElse(startingVersion) match {
      case Some(since) if since >= endV => // defensive: empty range
        SnapshotStore.changes(spark, table, endV, Some(endV), mark = streamMark)
          .limit(0)
      case Some(since) =>
        SnapshotStore.changes(spark, table, since, Some(endV), mark = streamMark)
      case None => // initial load: the snapshot itself, as inserts
        //  (dv-aware: merge-on-read-deleted rows must not arrive)
        val dataSchema = StructType(schema.fields.filterNot(f =>
          f.name == "_change_type" || f.name == "_commit_version"))
        SnapshotStore.readFilesAsDv(spark, table, dataSchema,
            SnapshotStore.state(spark, table, Some(endV)).live,
            asOf = Some(endV), mark = streamMark)
          .withColumn("_change_type", lit("insert"))
          .withColumn("_commit_version", lit(endV))
    }
    df.select(schema.fieldNames.toIndexedSeq.map(col): _*)
  }

  /** A follower that stalled longer than the maintenance retention
    * window fails DESCRIPTIVELY, not with a mid-scan FileNotFound: when
    * the catch-up range dips below the recorded vacuum floor
    * ([[SnapshotStore.vacuumFloor]]), the append files of the
    * below-floor versions are verified to still exist BEFORE any scan.
    * Cost: zero FS calls for a healthy follower (range at/above the
    * floor, or no vacuum ever ran); one exists() per suspect file once
    * for a stalled one. Files at/above the floor are always retained
    * (their version's own state is within the retention set), so only
    * the below-floor slice is checked.
    */
  private def requireRangeNotVacuumed(since: Long, endV: Long): Unit =
    SnapshotStore.vacuumFloor(spark, table)
      .filter(floor => since + 1 < floor).foreach { floor =>
        val suspect = SnapshotStore.addedSince(spark, table, since,
          Some(math.min(endV, floor - 1)), skipRewrites = true)
        failIfMissing(suspect, s"catch-up range ($since, $endV]", floor)
      }

  /** Restart recovery re-issues `getBatch(None, lastCommitted)` — an
    * initial load pinned at an OLD version, the same stalled-follower
    * shape through the other branch.
    */
  private def requireSnapshotNotVacuumed(endV: Long): Unit =
    SnapshotStore.vacuumFloor(spark, table)
      .filter(floor => endV < floor).foreach { floor =>
        failIfMissing(SnapshotStore.state(spark, table, Some(endV)).live,
          s"snapshot at version $endV", floor)
      }

  private def failIfMissing(files: Seq[SnapshotStore.AddFile],
                            what: String, floor: Long): Unit = {
    val c = spark.sessionState.newHadoopConf()
    val missing = files
      .map(a => new org.apache.hadoop.fs.Path(a.path))
      .filterNot(p => p.getFileSystem(c).exists(p))
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"snapshot stream on $table: $what references ${missing.size} " +
          s"file(s) vacuumed past the retention floor (v$floor) — this " +
          "follower stalled longer than the maintenance retention window. " +
          "Recover with a FRESH checkpoint: startingVersion=latest tails " +
          "only new commits, omitting startingVersion reloads the whole " +
          "current snapshot; raise the maintenance side's retainVersions " +
          "to widen the window")
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
    val cdf = parameters.get("readChangeFeed").exists(_.toBoolean)
    require(!(skip && cdf),
      "graft-snapshot stream: skipRewrites and readChangeFeed are mutually " +
        "exclusive — the change feed is already sound across rewrites")
    val starting = parameters.get("startingVersion").map {
      case "latest" => SnapshotStore.latestVersion(spark, table)
      case v => v.toLong
    }
    val maxVersions = parameters.get("maxVersionsPerTrigger").map(_.toLong)
    maxVersions.foreach(k => require(k >= 1,
      s"maxVersionsPerTrigger must be >= 1, got $k"))
    new SnapshotStreamSource(spark, table, schema, skip, starting, maxVersions, cdf)
  }

  /** The change-feed stream schema: table columns + the two tag columns
    * (idempotent — a caller-supplied schema that already carries the
    * tags passes through unchanged). */
  def changeFeedSchema(base: StructType): StructType =
    StructType(base.fields ++ Seq(
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("_commit_version",
        org.apache.spark.sql.types.LongType, nullable = false))
      .filterNot(f => base.fieldNames.contains(f.name)))
}
