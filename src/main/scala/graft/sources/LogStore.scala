package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.SparkSession

/** The conditional-commit primitive behind [[SnapshotStore]]'s publish —
  * extracted to an interface because put-if-absent is the ONE piece of
  * the commit protocol whose correct implementation depends on the
  * storage system (the portability matrix Delta documents for its
  * LogStore): HDFS renames are atomic at the namenode; a local `file:`
  * rename's exists-check is check-then-act and needs JVM serialization;
  * S3-class stores have no atomic rename at all and need an external
  * coordinator (the reference parks exactly this in DynamoDB —
  * infrastructure/emr_orchestration/stack.py). Swapping the primitive
  * swaps NOTHING else: versioning, retry, read-set validation and
  * replay in [[SnapshotStore.commit]] are storage-agnostic.
  *
  * Contract: return `true` iff THIS call created `target` with exactly
  * `payload`; `false` iff `target` already existed (the caller lost the
  * version race and retries at the next version). Any other failure
  * throws. At most one concurrent caller may win a given target, across
  * every process the store coordinates.
  *
  * Selection: `spark.graft.logStore` session conf naming a zero-arg
  * constructible class (default [[RenameLogStore]]).
  */
trait LogStore {
  def putIfAbsent(conf: Configuration, dir: Path, target: Path,
                  payload: Array[Byte]): Boolean

  /** Whether a commit file VISIBLE through this store is guaranteed
    * complete (rename-published: yes; create-then-write or plain
    * overwrite publish: no). Drives replay's integrity-footer
    * strictness: under a store with this true, a footer-less commit is
    * a complete legacy (pre-footer-format) file and replays; under one
    * with it false, footer-less means torn/in-flight and is rejected.
    */
  def visibleImpliesComplete: Boolean = true
}

object LogStore {
  val ConfKey = "spark.graft.logStore"

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, LogStore]()

  /** Resolve the session's log store (cached per class name). */
  def resolve(spark: SparkSession): LogStore = {
    val cls = spark.conf.getOption(ConfKey)
      .getOrElse(classOf[RenameLogStore].getName)
    cache.computeIfAbsent(cls,
      _ => Class.forName(cls).getDeclaredConstructor()
        .newInstance().asInstanceOf[LogStore])
  }

  private[sources] def writeTmp(conf: Configuration, dir: Path,
                                payload: Array[Byte]): Path = {
    val fs = dir.getFileSystem(conf)
    val tmp = new Path(dir, s".tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(payload) finally out.close()
    tmp
  }
}

/** `FileContext.rename(tmp, target, Rename.NONE)` — atomic on HDFS
  * (namenode rename2). On `file:` the exists-check inside rename is
  * check-then-act, so a JVM-wide per-directory lock serializes local
  * committers (multi-threaded single-JVM correctness — the contract
  * Delta's LocalLogStore documents). NOT safe for multi-cluster S3
  * without an external coordinator; plug a coordinated store instead.
  */
class RenameLogStore extends LogStore {
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  override def putIfAbsent(conf: Configuration, dir: Path, target: Path,
                           payload: Array[Byte]): Boolean = {
    val fs = dir.getFileSystem(conf)
    val tmp = LogStore.writeTmp(conf, dir, payload)
    val lock = locks.computeIfAbsent(dir.toString, _ => new Object)
    try {
      lock.synchronized {
        val fc = FileContext.getFileContext(dir.toUri, conf)
        fc.rename(tmp, target, Options.Rename.NONE)
      }
      true
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
        fs.delete(tmp, false); false
      case e: java.io.IOException if e.getMessage != null &&
          e.getMessage.contains("already exists") =>
        fs.delete(tmp, false); false
    }
  }
}

/** `fs.create(target, overwrite = false)` — the atomic-create leg:
  * correct wherever create-no-overwrite is atomic (HDFS, ABFS, GCS
  * with preconditions), no rename and no temp file. Demonstrates that
  * the publish primitive is genuinely swappable: [[SnapshotStoreSpec]]
  * runs the same race suite against it. Same `file:` caveat as rename
  * (create's exists-check is check-then-act locally) — hence the same
  * JVM-wide serialization.
  *
  * Content visibility: create-then-write makes the target LISTABLE
  * before its payload is complete (unlike rename, which publishes
  * complete content). That torn window is covered one layer up — every
  * commit carries a CRC integrity footer and [[SnapshotStore]] replay
  * rejects/retries a commit whose footer is absent or wrong, so a
  * concurrent reader can never silently replay a truncated commit.
  */
class AtomicCreateLogStore extends LogStore {
  override def visibleImpliesComplete: Boolean = false // create-then-write

  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  override def putIfAbsent(conf: Configuration, dir: Path, target: Path,
                           payload: Array[Byte]): Boolean = {
    val fs = dir.getFileSystem(conf)
    val lock = locks.computeIfAbsent(dir.toString, _ => new Object)
    lock.synchronized {
      if (fs.exists(target)) return false
      val out =
        try fs.create(target, false)
        catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException => return false }
      try out.write(payload) finally out.close()
      true
    }
  }
}

/** TRUE MULTI-PROCESS atomic create for `file:` paths —
  * `java.io.File#createNewFile` is POSIX `open(O_CREAT|O_EXCL)`, an
  * OS-level atomic claim across PROCESSES, where [[RenameLogStore]] /
  * [[AtomicCreateLogStore]] only serialize within one JVM (Hadoop's
  * RawLocalFileSystem exists-checks are check-then-act). This is the
  * leg that makes multiple DRIVER processes committing to one table on
  * a shared POSIX filesystem sound — the regime `local[*]` test
  * suites structurally cannot reach and a `local-cluster` deployment
  * with several writer apps actually lives in.
  *
  * Visibility: create-then-write, so a concurrently-listed commit may
  * be torn — `visibleImpliesComplete = false` routes replay through
  * the CRC-footer strictness, same as [[AtomicCreateLogStore]].
  * CAVEAT: O_EXCL is atomic on local/POSIX mounts; on NFSv2 it is
  * famously not — this store is for genuinely-local shared disks.
  */
class ProcessAtomicCreateLogStore extends LogStore {
  override def visibleImpliesComplete: Boolean = false // create-then-write

  override def putIfAbsent(conf: Configuration, dir: Path, target: Path,
                           payload: Array[Byte]): Boolean = {
    val uri = target.toUri
    require(uri.getScheme == null || uri.getScheme == "file",
      s"${getClass.getSimpleName} is the local-filesystem leg; got scheme " +
        s"'${uri.getScheme}' — use a coordinated store for remote filesystems")
    val f = new java.io.File(uri.getPath)
    Option(f.getParentFile).foreach(_.mkdirs())
    if (!f.createNewFile()) false // O_EXCL lost: the version is taken
    else {
      val out = new java.io.FileOutputStream(f)
      try out.write(payload) finally out.close()
      true
    }
  }
}

/** The S3-class leg: a store for filesystems with NO atomic primitive
  * at all — not rename, not create-no-overwrite. Correctness comes
  * entirely from an external coordination service that arbitrates
  * version ownership, the role the reference parks in DynamoDB
  * (infrastructure/emr_orchestration/stack.py) and Delta documents as
  * the S3 multi-cluster LogStore. The protocol is the published
  * two-phase shape:
  *
  *  1. CLAIM: put-if-absent of `(target → owner, tmpPath, PENDING)` in
  *     the coordination table. Losing the claim means the version is
  *     taken — but a PENDING entry may belong to a CRASHED winner, so
  *     the loser RECOVERS it: copy the recorded temp file (written
  *     complete before the claim) onto the target, mark COMPLETE,
  *     then report "lost" so the caller retries at the next version.
  *  2. PUBLISH: the claim winner copies its temp file onto the target
  *     with a plain overwrite create — deliberately non-atomic; a torn
  *     read in this window is caught by the commit CRC footer, and a
  *     crash is repaired by the next claimant's recovery — then marks
  *     the entry COMPLETE.
  *
  * The coordination table here is an in-JVM [[CoordinatedLogStore.Coord]]
  * test double; a production port swaps it for a DynamoDB/etcd/JDBC
  * conditional put WITHOUT touching the protocol — putIfAbsent below
  * only needs `claim` (conditional insert), `get`, and `complete`
  * (status flip), exactly DynamoDB's conditional-write API surface.
  */
class CoordinatedLogStore extends LogStore {
  override def visibleImpliesComplete: Boolean = false // overwrite publish

  /** The coordination service arbitrating claims — the in-JVM double by
    * default; [[JdbcCoordinatedLogStore]] overrides with a REAL
    * database-backed conditional put. The protocol below never changes.
    */
  protected def coordService: Coordination = CoordinatedLogStore.coord

  override def putIfAbsent(conf: Configuration, dir: Path, target: Path,
                           payload: Array[Byte]): Boolean = {
    val fs = dir.getFileSystem(conf)
    // Temp file is COMPLETE and durable before the claim: recovery can
    // always finish a crashed winner's publish from it.
    val tmp = LogStore.writeTmp(conf, dir, payload)
    val key = target.toString
    val mine = CoordinatedLogStore.Entry(
      owner = CoordinatedLogStore.processId, tmpPath = tmp.toString,
      complete = false)
    val prev = coordService.claim(key, mine)
    prev match {
      case None => // claim won: publish (non-atomic is fine, see doc)
        val out = fs.create(target, true)
        try out.write(payload) finally out.close()
        coordService.complete(key)
        CoordinatedLogStore.publishes.incrementAndGet()
        true
      case Some(e) =>
        fs.delete(tmp, false) // our temp is unneeded — we lost
        if (!e.complete) {
          // crashed (or in-flight) winner: finish its publish from ITS
          // temp file, idempotently — both racers may recover; the
          // content they copy is identical (the recorded temp).
          val theirTmp = new Path(e.tmpPath)
          if (fs.exists(theirTmp)) {
            val in = fs.open(theirTmp)
            val buf = new java.io.ByteArrayOutputStream()
            try {
              val b = new Array[Byte](65536)
              var n = in.read(b)
              while (n >= 0) { buf.write(b, 0, n); n = in.read(b) }
            } finally in.close()
            val out = fs.create(target, true)
            try out.write(buf.toByteArray) finally out.close()
            coordService.complete(key)
            CoordinatedLogStore.recoveries.incrementAndGet()
          } else if (!fs.exists(target)) {
            // ghost claim: PENDING entry, no temp, no target — the
            // recovery source is gone (e.g. vacuumed). Returning false
            // here would livelock every committer at this version;
            // fail loudly instead (operator intervention: clear the
            // coordination entry). A production port must retain temp
            // files until their entry is COMPLETE for exactly this
            // reason (Delta's DynamoDB LogStore documents the same).
            throw new IllegalStateException(
              s"coordinated commit $key: PENDING claim by ${e.owner} with " +
                s"no recoverable temp file (${e.tmpPath}) and no published " +
                "target — unrecoverable ghost claim; clear the coordination " +
                "entry after verifying the version is truly absent")
          }
        }
        false
    }
  }
}

/** The coordination-service surface the claim/complete protocol needs —
  * DynamoDB's conditional-write API reduced to three calls
  * (conditional PutItem / GetItem / UpdateItem). `claim` must be an
  * ATOMIC conditional insert across every coordinated process.
  */
trait Coordination {
  /** Conditional insert: None = claim won; Some(existing) = lost. */
  def claim(key: String, e: CoordinatedLogStore.Entry): Option[CoordinatedLogStore.Entry]
  def complete(key: String): Unit
  def get(key: String): Option[CoordinatedLogStore.Entry]
}

object CoordinatedLogStore {
  final case class Entry(owner: String, tmpPath: String, complete: Boolean)

  /** In-JVM [[Coordination]] double (tests, single-process use). */
  final class Coord extends Coordination {
    private val table =
      new java.util.concurrent.ConcurrentHashMap[String, Entry]()
    override def claim(key: String, e: Entry): Option[Entry] =
      Option(table.putIfAbsent(key, e))
    override def complete(key: String): Unit =
      table.computeIfPresent(key, (_, e) => e.copy(complete = true))
    override def get(key: String): Option[Entry] = Option(table.get(key))
    def clear(): Unit = table.clear()
  }

  val coord = new Coord
  val processId: String = java.util.UUID.randomUUID().toString
  // observability for the spec: how many publishes went through the
  // winner path vs the crash-recovery path
  val publishes = new java.util.concurrent.atomic.AtomicLong()
  val recoveries = new java.util.concurrent.atomic.AtomicLong()
}

/** [[CoordinatedLogStore]] with the coordination table in a REAL
  * database reached over JDBC — the protocol proven against an actual
  * conditional-put API instead of the in-JVM double. The claim is an
  * `INSERT` into a PRIMARY-KEY'd table: the database's uniqueness
  * enforcement IS the atomic conditional insert (DynamoDB's
  * `attribute_not_exists` PutItem; Delta's S3 multi-cluster LogStore
  * commits through exactly this shape). Derby ships with Spark, so the
  * embedded `jdbc:derby:` URL works out of the box; any JDBC database
  * with primary keys (Postgres, MySQL) plugs in through the SAME SQL —
  * swap the URL via the `graft.coord.jdbc.url` system property (a
  * system property, not Spark conf, because [[LogStore.resolve]]
  * constructs stores reflectively with no session at hand).
  */
class JdbcCoordinatedLogStore extends CoordinatedLogStore {
  override protected def coordService: Coordination =
    JdbcCoordinatedLogStore.resolve()
}

object JdbcCoordinatedLogStore {
  val UrlProp = "graft.coord.jdbc.url"

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, JdbcCoordination]()

  def resolve(): JdbcCoordination = {
    val url = sys.props.getOrElse(UrlProp,
      s"jdbc:derby:${sys.props("java.io.tmpdir")}/graft-coord-db;create=true")
    cache.computeIfAbsent(url, u => new JdbcCoordination(u))
  }
}

/** [[Coordination]] over JDBC. One short-lived connection per call —
  * claim latency is one database round trip, which is the cost DynamoDB
  * charges too; callers hit this once per commit attempt, not per row.
  */
final class JdbcCoordination(url: String) extends Coordination {
  import CoordinatedLogStore.Entry

  // Derby's embedded driver rides with Spark; other databases bring
  // their own driver on the classpath (DriverManager autoloads it).
  try Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
  catch { case _: ClassNotFoundException => () }

  private def withConn[A](f: java.sql.Connection => A): A = {
    val c = java.sql.DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  // bootstrap: create the coordination table if absent (Derby has no
  // IF NOT EXISTS — X0Y32 = "already exists", benign under a race)
  withConn { c =>
    try {
      c.createStatement().executeUpdate(
        "CREATE TABLE graft_coord (" +
          "k VARCHAR(1024) PRIMARY KEY, owner VARCHAR(128), " +
          "tmp VARCHAR(1024), complete INT)")
      ()
    } catch {
      case e: java.sql.SQLException if e.getSQLState == "X0Y32" => ()
    }
  }

  override def claim(key: String, e: Entry): Option[Entry] = withConn { c =>
    try {
      val ps = c.prepareStatement(
        "INSERT INTO graft_coord (k, owner, tmp, complete) VALUES (?, ?, ?, 0)")
      ps.setString(1, key); ps.setString(2, e.owner); ps.setString(3, e.tmpPath)
      ps.executeUpdate()
      None // the primary key admitted us: claim won, atomically
    } catch {
      // a lost claim is any integrity-constraint violation — SQLState
      // class 23 (23505 unique violation etc.). Match on the STATE, not
      // the exception subclass: Derby raises the dedicated
      // SQLIntegrityConstraintViolationException but PostgreSQL's
      // driver throws a plain SQLException subclass (PSQLException)
      // carrying 23505, which a subclass match would let escape and
      // crash the commit instead of taking the claim-lost path.
      case e: java.sql.SQLException
          if Option(e.getSQLState).exists(_.startsWith("23")) =>
        getIn(c, key) // duplicate key: lost — return the winner's entry
    }
  }

  override def complete(key: String): Unit = withConn { c =>
    val ps = c.prepareStatement("UPDATE graft_coord SET complete = 1 WHERE k = ?")
    ps.setString(1, key)
    ps.executeUpdate()
    ()
  }

  override def get(key: String): Option[Entry] = withConn(getIn(_, key))

  private def getIn(c: java.sql.Connection, key: String): Option[Entry] = {
    val ps = c.prepareStatement(
      "SELECT owner, tmp, complete FROM graft_coord WHERE k = ?")
    ps.setString(1, key)
    val rs = ps.executeQuery()
    if (rs.next()) Some(Entry(rs.getString(1), rs.getString(2), rs.getInt(3) == 1))
    else None
  }
}
