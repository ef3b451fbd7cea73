package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Exclusive WRITER LEASE for a streaming dedup sink's store family —
  * the mechanism that makes the sinks' single-writer assumption
  * ENFORCEABLE instead of documented. Two writer roles exist for one
  * `indexPath` (bands/vectors/sigs/postings/verdicts/capped live under
  * it): the sink's own `foreachBatch` (acquired per micro-batch,
  * released at batch end) and `CALL graft.dedup_sink_maintain`
  * (acquired for the whole compaction pass). Whoever cannot acquire is
  * refused IMMEDIATELY — before any staging work — with the holder's
  * identity in the message, replacing the old behavior where both
  * sides staged optimistically and one died mid-batch on a
  * `mustBeLive` commit conflict.
  *
  * PROTOCOL — a tiny append-only lease log at `<indexPath>/_lease/`,
  * the same shape as the commit log and arbitrated by the same
  * [[LogStore.putIfAbsent]] primitive (so it inherits every
  * filesystem's atomicity story, including the Coordinated/Jdbc
  * stores' external claim table on S3-class stores):
  *
  *   - entries are immutable files `%020d.lease`, one TSV line:
  *     `holder role acquiredMs ttlMs acquire|release`;
  *   - ACQUIRE: read the latest entry; if it is an unreleased,
  *     unexpired `acquire` by someone else → throw (deterministic
  *     refusal). Otherwise atomically create version latest+1; losing
  *     that create race re-reads, so exactly one contender wins and
  *     every loser refuses against the winner's visible entry.
  *   - RELEASE: append a `release` entry. Releases never delete —
  *     deletion races are the classic lock-file flaw (two stealers of
  *     a stale lock can delete each other's fresh locks); an
  *     append-only log has no delete in the critical path.
  *   - CRASH: a holder that dies leaves an unreleased entry; after
  *     `ttlMs` it is STEAL-ABLE (the next acquire treats it as
  *     expired). TTL expiry is wall-clock against the entry's own
  *     `acquiredMs` (falling back to file mtime for a torn entry under
  *     a non-atomic-visibility store) — cross-machine clock skew must
  *     be small against the 30-minute default, and the snapshot
  *     commit protocol's optimistic `mustBeLive` check remains the
  *     correctness backstop if a steal ever races a still-live holder
  *     past its TTL (the lease is a fail-EARLY mechanism; it never
  *     replaces commit-time safety).
  *
  * Old entries prune best-effort on acquire (keep the last 8) so the
  * log stays O(1) — safe because only the latest entry carries state.
  */
object SinkLease {
  /** A held lease: pass back to [[release]]. */
  final case class Lease(indexPath: String, version: Long, holder: String,
                         role: String)

  private final case class Entry(holder: String, role: String,
                                 acquiredMs: Long, ttlMs: Long,
                                 release: Boolean)

  /** Long against a sink batch (seconds) and a maintenance pass
    * (minutes); short enough that a crashed holder does not wedge the
    * path for an operator-visible time.
    */
  val DefaultTtlMs: Long = 30L * 60 * 1000

  private val Keep = 8 // lease-log entries retained by the prune

  private def leaseDir(indexPath: String) = new Path(indexPath, "_lease")
  private def entryPath(indexPath: String, v: Long) =
    new Path(leaseDir(indexPath), f"$v%020d.lease")
  private def conf(spark: SparkSession) = spark.sessionState.newHadoopConf()

  private def encode(e: Entry): Array[Byte] =
    (s"${e.holder}\t${e.role}\t${e.acquiredMs}\t${e.ttlMs}\t" +
      (if (e.release) "release" else "acquire") + "\n").getBytes("UTF-8")

  private def decode(bytes: Array[Byte]): Option[Entry] = {
    val parts = new String(bytes, "UTF-8").trim.split('\t')
    if (parts.length != 5) None
    else
      try Some(Entry(parts(0), parts(1), parts(2).toLong, parts(3).toLong,
        parts(4) == "release"))
      catch { case _: NumberFormatException => None }
  }

  private def listVersions(fs: FileSystem, indexPath: String): Seq[Long] = {
    val dir = leaseDir(indexPath)
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq.filter(_.isFile)
      .map(_.getPath.getName).filter(_.endsWith(".lease"))
      .flatMap(n => scala.util.Try(n.stripSuffix(".lease").toLong).toOption)
      .sorted
  }

  private def readEntry(fs: FileSystem, p: Path): (Option[Entry], Long) = {
    val st = fs.getFileStatus(p)
    val in = fs.open(p)
    val bytes =
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val b = new Array[Byte](4096)
        var n = in.read(b)
        while (n >= 0) { buf.write(b, 0, n); n = in.read(b) }
        buf.toByteArray
      } finally in.close()
    (decode(bytes), st.getModificationTime)
  }

  /** The current holder, if the latest entry is an unexpired acquire:
    * (holder, role, ageMs). Diagnostic surface for error messages and
    * specs; the authoritative check is inside [[acquire]]'s loop.
    */
  def holder(spark: SparkSession, indexPath: String)
      : Option[(String, String, Long)] = {
    val fs = leaseDir(indexPath).getFileSystem(conf(spark))
    listVersions(fs, indexPath).lastOption.flatMap { v =>
      val (e, mtime) = readEntry(fs, entryPath(indexPath, v))
      val now = System.currentTimeMillis()
      e match {
        case Some(en) if !en.release && now - en.acquiredMs < en.ttlMs =>
          Some((en.holder, en.role, now - en.acquiredMs))
        case Some(_) => None
        case None => // torn entry: age by mtime, default TTL
          if (now - mtime < DefaultTtlMs) Some(("<torn-entry>", "unknown", now - mtime))
          else None
      }
    }
  }

  /** Acquire the path's writer lease or throw — BEFORE the caller has
    * staged anything. Deterministic: an active foreign lease refuses
    * on the first read; an atomic-create race loser re-reads and then
    * refuses against the winner's entry. Never blocks.
    */
  def acquire(spark: SparkSession, indexPath: String, role: String,
              ttlMs: Long = DefaultTtlMs): Lease = {
    require(ttlMs > 0, s"ttlMs must be positive: $ttlMs")
    require(!role.exists(ch => ch == '\t' || ch == '\n'),
      s"role must be tab/newline-free: $role")
    val c = conf(spark)
    val fs = leaseDir(indexPath).getFileSystem(c)
    val store = LogStore.resolve(spark)
    val me = java.util.UUID.randomUUID().toString
    // bounded: each iteration either refuses, wins, or observed a
    // version advance by a racer whose entry the next read arbitrates
    var attempts = 0
    while (attempts < 16) {
      attempts += 1
      val versions = listVersions(fs, indexPath)
      val latestV = versions.lastOption.getOrElse(0L)
      versions.lastOption.foreach { v =>
        val (e, mtime) = readEntry(fs, entryPath(indexPath, v))
        val now = System.currentTimeMillis()
        e match {
          case Some(en) if !en.release && now - en.acquiredMs < en.ttlMs =>
            throw new IllegalStateException(
              s"sink writer lease for $indexPath is held by role '${en.role}' " +
                s"(holder ${en.holder}, age ${now - en.acquiredMs} ms, " +
                s"ttl ${en.ttlMs} ms) — refused before staging; retry after " +
                "the holder releases (a sink batch releases at batch end, " +
                s"dedup_sink_maintain at pass end), or after expiry")
          case None if now - mtime < DefaultTtlMs =>
            // torn latest entry (non-atomic-visibility store, writer
            // mid-flight or crashed): conservative — treat as held
            // until its mtime ages past the default TTL
            throw new IllegalStateException(
              s"sink writer lease for $indexPath has an in-flight or torn " +
                s"entry (v$v, age ${now - mtime} ms) — refused before " +
                "staging; retries succeed once it completes or expires")
          case _ => () // released, expired, or aged-out torn entry
        }
      }
      val lease = Entry(me, role, System.currentTimeMillis(), ttlMs,
        release = false)
      if (store.putIfAbsent(c, leaseDir(indexPath),
          entryPath(indexPath, latestV + 1), encode(lease))) {
        prune(fs, indexPath, latestV + 1)
        return Lease(indexPath, latestV + 1, me, role)
      }
    }
    throw new IllegalStateException(
      s"sink writer lease for $indexPath: acquisition livelocked after " +
        s"$attempts attempts — pathological contention on the lease log")
  }

  /** Append the release entry. No-op when the lease was already lost
    * (expired and stolen): the stealer's entry is latest and must not
    * be clobbered — the commit protocol's optimistic check covers the
    * overlap window.
    */
  def release(spark: SparkSession, lease: Lease): Unit = {
    val c = conf(spark)
    val fs = leaseDir(lease.indexPath).getFileSystem(c)
    val store = LogStore.resolve(spark)
    var attempts = 0
    while (attempts < 16) {
      attempts += 1
      val latestV = listVersions(fs, lease.indexPath).lastOption.getOrElse(0L)
      if (latestV != lease.version) return // stolen after expiry: moot
      val rel = Entry(lease.holder, lease.role, System.currentTimeMillis(),
        0L, release = true)
      if (store.putIfAbsent(c, leaseDir(lease.indexPath),
          entryPath(lease.indexPath, latestV + 1), encode(rel))) return
    }
    ()
  }

  /** Run `f` under the path's writer lease; always releases. */
  def withLease[A](spark: SparkSession, indexPath: String, role: String,
                   ttlMs: Long = DefaultTtlMs)(f: => A): A = {
    val l = acquire(spark, indexPath, role, ttlMs)
    try f finally release(spark, l)
  }

  private def prune(fs: FileSystem, indexPath: String, latest: Long): Unit =
    try {
      listVersions(fs, indexPath).filter(_ <= latest - Keep)
        .foreach(v => fs.delete(entryPath(indexPath, v), false))
    } catch { case scala.util.control.NonFatal(_) => () }
}
