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
  */
class AtomicCreateLogStore extends LogStore {
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
