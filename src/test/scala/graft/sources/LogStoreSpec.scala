package graft.sources

import java.util.concurrent.{CyclicBarrier, Executors, TimeUnit}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** A [[RenameLogStore]] that forces the first two publishers of an armed
  * commit file to rendezvous BEFORE either attempts the put — the
  * check-then-act window a real multi-writer race hits, made
  * deterministic. Top-level with a zero-arg ctor so `spark.graft.logStore`
  * can instantiate it reflectively, state in the companion.
  */
class RendezvousLogStore extends RenameLogStore {
  override def putIfAbsent(conf: Configuration, dir: Path, target: Path,
                           payload: Array[Byte]): Boolean = {
    if (RendezvousLogStore.armed(target.getName)) {
      try RendezvousLogStore.barrier.await(5, TimeUnit.SECONDS)
      catch { case _: Exception => () } // a broken barrier must not wedge retries
    }
    val won = super.putIfAbsent(conf, dir, target, payload)
    if (won) RendezvousLogStore.wins.merge(target.getName, Integer.valueOf(1),
      (a: Integer, b: Integer) => Integer.valueOf(a + b))
    won
  }
}

object RendezvousLogStore {
  val barrier = new CyclicBarrier(2)
  @volatile var armedSuffix: String = ""
  val wins = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  def armed(name: String): Boolean =
    armedSuffix.nonEmpty && name.endsWith(armedSuffix)
}

/** The commit protocol against swapped publish primitives: exactly one
  * of two same-version racers wins under a deterministic rendezvous,
  * and the whole multi-writer suite holds on a rename-free
  * atomic-create store — proof the primitive is the ONLY
  * storage-coupled piece.
  */
class LogStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tempTable(tag: String): String =
    "file:" + java.nio.file.Files.createTempDirectory(s"graft-log-$tag").toString + "/t"

  private def withLogStore[A](cls: Class[_])(body: => A): A =
    try { spark.conf.set(LogStore.ConfKey, cls.getName); body }
    finally spark.conf.unset(LogStore.ConfKey)

  test("fault injection: two committers forced onto ONE version — exactly one wins, loser retries") {
    withLogStore(classOf[RendezvousLogStore]) {
      val t = tempTable("duel")
      SnapshotStore.append(Seq(1L).toDF("id"), t) // v1, no contention armed
      RendezvousLogStore.wins.clear()
      RendezvousLogStore.armedSuffix = f"${2L}%020d.commit"
      val pool = Executors.newFixedThreadPool(2)
      val versions =
        try {
          val fs = Seq("a", "b").map { w =>
            pool.submit(new java.util.concurrent.Callable[Long] {
              def call(): Long =
                SnapshotStore.append(Seq(100L + w.hashCode % 10).toDF("id"), t)
            })
          }
          fs.map(_.get(60, TimeUnit.SECONDS))
        } finally { RendezvousLogStore.armedSuffix = ""; pool.shutdown() }
      // both held at the v2 gate, released together: one won v2, the
      // loser observed the loss and re-published as v3
      assert(versions.toSet === Set(2L, 3L), s"got $versions")
      assert(RendezvousLogStore.wins.get(f"${2L}%020d.commit") === 1,
        "exactly one putIfAbsent may create a given commit file")
      assert(SnapshotStore.versions(spark, t) === Seq(1L, 2L, 3L))
      assert(SnapshotStore.snapshot(spark, t).count() === 3L)
    }
  }

  test("atomic-create store passes the multi-writer suite: serial versions, no loss") {
    withLogStore(classOf[AtomicCreateLogStore]) {
      val t = tempTable("create")
      val threads = 4; val each = 3
      val pool = Executors.newFixedThreadPool(threads)
      val got =
        try {
          val fs = (0 until threads).map { w =>
            pool.submit(new java.util.concurrent.Callable[Seq[Long]] {
              def call(): Seq[Long] = (0 until each).map { i =>
                SnapshotStore.append(Seq(w * 100L + i).toDF("id"), t)
              }
            })
          }
          fs.flatMap(_.get(120, TimeUnit.SECONDS))
        } finally pool.shutdown()
      assert(got.toSet === (1L to (threads * each).toLong).toSet,
        "every committer lands a distinct serial version")
      assert(SnapshotStore.snapshot(spark, t).count() === (threads * each).toLong)
      // schema meta and time travel behave identically under the swap
      assert(SnapshotStore.tableSchema(spark, t).get.fieldNames.toSeq === Seq("id"))
      assert(SnapshotStore.snapshot(spark, t, asOf = Some(1L)).count() === 1L)
    }
  }

  test("torn commit: a visible-but-incomplete commit file is rejected loudly, never replayed truncated") {
    // The torn window exists only under stores whose visibility does NOT
    // imply completeness (create-then-write) — replay's footer check is
    // strict exactly there, so run the scenario under that store.
    withLogStore(classOf[AtomicCreateLogStore]) {
      val t = tempTable("torn")
      SnapshotStore.append(Seq(1L).toDF("id"), t) // v1, complete
      // Simulate the atomic-create torn window: v2 exists in the log dir
      // with a truncated payload (no integrity footer) — the shape a
      // reader races against between create() and close().
      val dir = new Path(t, "_graft_log")
      val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
      val torn = new Path(dir, f"${2L}%020d.commit")
      val out = fs.create(torn, false)
      try out.write("m\top\tappend\na\tdata/ghost.parquet\t5\t-\n".getBytes("UTF-8"))
      finally out.close()
      val e = intercept[IllegalStateException] {
        SnapshotStore.state(spark, t)
      }
      // the FORMAT POLICY message: a footer-less commit under this store
      // is named as unsupported pre-CRC format (it is indistinguishable
      // from a torn write), not misdiagnosed as merely torn
      assert(e.getMessage.contains("unsupported pre-CRC format"),
        s"wrong failure: ${e.getMessage}")
    }
  }

  test("legacy pre-footer commit replays under a rename store; corrupted footer still fails") {
    // Rename-published commits are complete on visibility, so a commit
    // written by a pre-footer-format version of the store (no `e\t...`
    // last line) must replay — no log-format break for existing tables.
    val t = tempTable("legacy")
    SnapshotStore.append(Seq(1L, 2L).toDF("id"), t) // v1, footered
    val dir = new Path(t, "_graft_log")
    val conf = spark.sessionState.newHadoopConf()
    val fs = dir.getFileSystem(conf)
    // v2 in the OLD format: meta + remove-nothing, no footer line
    val v2 = new Path(dir, f"${2L}%020d.commit")
    val out = fs.create(v2, false)
    try out.write("m\top\tappend\n".getBytes("UTF-8")) finally out.close()
    assert(SnapshotStore.versions(spark, t) === Seq(1L, 2L))
    assert(SnapshotStore.snapshot(spark, t).count() === 2L) // replays fine
    assert(SnapshotStore.history(spark, t).map(_._1) === Seq(2L, 1L))
    // a PRESENT-but-wrong footer is corruption in every mode
    val v3 = new Path(dir, f"${3L}%020d.commit")
    val out3 = fs.create(v3, false)
    try out3.write("m\top\tappend\ne\tdeadbeef\n".getBytes("UTF-8"))
    finally out3.close()
    val e = intercept[IllegalStateException] { SnapshotStore.state(spark, t) }
    assert(e.getMessage.contains("torn or still in-flight"))
  }

  test("coordinated store (no atomic fs primitive): multi-writer suite holds on external arbitration alone") {
    withLogStore(classOf[CoordinatedLogStore]) {
      CoordinatedLogStore.coord.clear()
      val t = tempTable("coord")
      val threads = 4; val each = 3
      val pool = Executors.newFixedThreadPool(threads)
      val got =
        try {
          val fs = (0 until threads).map { w =>
            pool.submit(new java.util.concurrent.Callable[Seq[Long]] {
              def call(): Seq[Long] = (0 until each).map { i =>
                SnapshotStore.append(Seq(w * 100L + i).toDF("id"), t)
              }
            })
          }
          fs.flatMap(_.get(120, TimeUnit.SECONDS))
        } finally pool.shutdown()
      assert(got.toSet === (1L to (threads * each).toLong).toSet,
        "every committer lands a distinct serial version")
      assert(SnapshotStore.snapshot(spark, t).count() === (threads * each).toLong)
      assert(SnapshotStore.snapshot(spark, t, asOf = Some(1L)).count() === 1L)
    }
  }

  test("coordinated store: a crashed claim winner is recovered by the next committer from its temp file") {
    withLogStore(classOf[CoordinatedLogStore]) {
      CoordinatedLogStore.coord.clear()
      CoordinatedLogStore.recoveries.set(0L)
      val t = tempTable("recover")
      SnapshotStore.append(Seq(1L).toDF("id"), t) // v1 normally
      // Crashed writer: claimed v2 and durably wrote its temp payload,
      // then died before publishing target or marking COMPLETE.
      val dir = new Path(t, "_graft_log")
      val conf = spark.sessionState.newHadoopConf()
      val body = "m\top\tappend"
      val crc = new java.util.zip.CRC32()
      crc.update(body.getBytes("UTF-8"))
      val payload =
        (body + "\n" + f"e\t${crc.getValue}%08x" + "\n").getBytes("UTF-8")
      val tmp = LogStore.writeTmp(conf, dir, payload)
      val v2 = new Path(dir, f"${2L}%020d.commit")
      assert(CoordinatedLogStore.coord.claim(v2.toString,
        CoordinatedLogStore.Entry("crashed-proc", tmp.toString,
          complete = false)).isEmpty, "crashed writer's claim must win")
      // Live committer: loses the v2 claim, RECOVERS the crashed commit
      // from its temp file, then lands as v3.
      val v = SnapshotStore.append(Seq(2L).toDF("id"), t)
      assert(v === 3L, s"live committer must land after the recovered v2, got v$v")
      assert(CoordinatedLogStore.recoveries.get() >= 1L, "recovery path must run")
      assert(SnapshotStore.versions(spark, t) === Seq(1L, 2L, 3L))
      // the recovered v2 replays cleanly (its footer came from the temp)
      assert(SnapshotStore.history(spark, t).map(_._1) === Seq(3L, 2L, 1L))
      assert(SnapshotStore.snapshot(spark, t).count() === 2L)
    }
  }

  test("JDBC-backed coordination: a REAL conditional-put database arbitrates the race + crash recovery") {
    // The in-JVM Coord double becomes an actual database (Derby, ships
    // with Spark): the claim is an INSERT against a PRIMARY KEY — the
    // database's uniqueness enforcement is the atomic conditional put,
    // the DynamoDB shape the reference parks its lock in. Same protocol
    // suite, zero protocol changes.
    val dbDir = java.nio.file.Files.createTempDirectory("graft-coord-jdbc").toString
    System.setProperty("derby.stream.error.file", s"$dbDir/derby.log")
    System.setProperty(JdbcCoordinatedLogStore.UrlProp,
      s"jdbc:derby:$dbDir/db;create=true")
    try withLogStore(classOf[JdbcCoordinatedLogStore]) {
      val t = tempTable("jdbccoord")
      val threads = 4; val each = 2
      val pool = Executors.newFixedThreadPool(threads)
      val got =
        try {
          val fs = (0 until threads).map { w =>
            pool.submit(new java.util.concurrent.Callable[Seq[Long]] {
              def call(): Seq[Long] = (0 until each).map { i =>
                SnapshotStore.append(Seq(w * 100L + i).toDF("id"), t)
              }
            })
          }
          fs.flatMap(_.get(120, TimeUnit.SECONDS))
        } finally pool.shutdown()
      assert(got.toSet === (1L to (threads * each).toLong).toSet,
        "every committer lands a distinct serial version through the database")
      assert(SnapshotStore.snapshot(spark, t).count() === (threads * each).toLong)
      // crash recovery THROUGH the database: a dead process's PENDING
      // claim sits in the real table; the next committer recovers it
      val dir = new Path(t, "_graft_log")
      val conf = spark.sessionState.newHadoopConf()
      val body = "m\top\tappend"
      val crc = new java.util.zip.CRC32(); crc.update(body.getBytes("UTF-8"))
      val payload =
        (body + "\n" + f"e\t${crc.getValue}%08x" + "\n").getBytes("UTF-8")
      val tmp = LogStore.writeTmp(conf, dir, payload)
      val v9 = new Path(dir, f"${9L}%020d.commit")
      val coord = JdbcCoordinatedLogStore.resolve()
      assert(coord.claim(v9.toString, CoordinatedLogStore.Entry(
        "crashed-proc", tmp.toString, complete = false)).isEmpty,
        "crashed writer's claim must win in the database")
      CoordinatedLogStore.recoveries.set(0L)
      val v = SnapshotStore.append(Seq(999L).toDF("id"), t)
      assert(v === 10L, s"live committer lands after the recovered v9, got v$v")
      assert(CoordinatedLogStore.recoveries.get() >= 1L, "recovery path must run")
      assert(coord.get(v9.toString).exists(_.complete),
        "recovery must flip the database entry to COMPLETE")
      assert(SnapshotStore.versions(spark, t) === (1L to 10L))
      assert(SnapshotStore.snapshot(spark, t).count() === 9L)
    } finally System.clearProperty(JdbcCoordinatedLogStore.UrlProp)
  }

  test("store resolution: unknown class fails loudly; default is the rename store") {
    val t = tempTable("resolve")
    withLogStore(classOf[RenameLogStore]) { // explicit = default
      SnapshotStore.append(Seq(1L).toDF("id"), t)
    }
    assert(SnapshotStore.latestVersion(spark, t) === 1L)
    try {
      spark.conf.set(LogStore.ConfKey, "graft.sources.NoSuchStore")
      intercept[ClassNotFoundException] {
        SnapshotStore.append(Seq(2L).toDF("id"), t)
      }
    } finally spark.conf.unset(LogStore.ConfKey)
  }
}
