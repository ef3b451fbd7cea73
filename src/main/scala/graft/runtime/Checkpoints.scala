package graft.runtime

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** Registry of block-manager checkpoints created by operator-internal
  * materialization barriers ([[graft.operators.Dedup.materialize]] and
  * friends).
  *
  * `Dataset.localCheckpoint()` persists the query's output as storage
  * blocks AND truncates lineage, so the blocks can never be dropped by
  * Spark itself while the JVM lives — each dedup/similarity query that
  * materializes a signature or posting table therefore GROWS the block
  * manager by one table per execution. In a long-lived session (a bench
  * loop, a notebook, a service) that accumulation first pressures the
  * unified memory region (execution starts spilling against dead cache)
  * and eventually the disk store. The registry makes the lifetime
  * explicit:
  *
  *  - operators [[track]] every checkpoint they create whose blocks must
  *    outlive the operator call (the returned lazy frame still reads
  *    them);
  *  - iterative loops [[free]] a frontier as soon as the next round's
  *    checkpoint has materialized (in-loop rolling release — the only
  *    consumers of round i are round i+1's build and the async state
  *    write, both complete by then);
  *  - harnesses (Bench / Verify / any service executing whole queries)
  *    call [[release]] after the terminal action of each query, when no
  *    live frame can reference the scratch blocks anymore.
  *
  * Freeing is safe ONLY after every consumer's action has run: a
  * local-checkpointed RDD has no recompute path, so a subsequent action
  * on a frame rooted in a freed checkpoint fails with a missing-block
  * error (loudly, never silently wrong).
  */
object Checkpoints {

  private val tracked = ConcurrentHashMap.newKeySet[RDD[_]]()

  // RDD.unpersist on a locally-checkpointed RDD unconditionally warns
  // that the data cannot be recomputed — which is EXACTLY the intended
  // semantics of every release below (consumers are done; the blocks
  // are dead weight). One warning per freed table per query floods the
  // logs a harness tails, so that single logger drops to ERROR.
  try org.apache.logging.log4j.core.config.Configurator.setLevel(
    "org.apache.spark.rdd.MapPartitionsRDD", org.apache.logging.log4j.Level.ERROR)
  catch { case _: Throwable => () } // non-log4j2 deployments: keep the noise

  /** The persisted RDDs behind a frame's checkpoint barriers: every
    * [[LogicalRDD]] leaf of the analyzed plan. For a frame returned by
    * `localCheckpoint()` that is exactly its one backing RDD; for a
    * projection built over checkpoints it is each of them.
    */
  private def checkpointRdds(df: DataFrame): Seq[RDD[_]] =
    df.queryExecution.analyzed.collect { case lr: LogicalRDD => lr.rdd }

  /** Register a frame's checkpoint blocks for a later [[release]]. */
  def track(df: DataFrame): DataFrame = {
    checkpointRdds(df).foreach(tracked.add)
    df
  }

  /** Unpersist the checkpoint blocks under `df` NOW (rolling in-loop
    * release). No-op for frames with no checkpoint leaves (e.g. the
    * reliable-storage variant that reads back from parquet).
    */
  def free(df: DataFrame, blocking: Boolean = false): Unit =
    checkpointRdds(df).foreach { r =>
      if (r.getStorageLevel != StorageLevel.NONE) r.unpersist(blocking)
      tracked.remove(r)
    }

  /** Unpersist every tracked checkpoint; returns how many still held
    * blocks. Call after the terminal action of a query, when no live
    * frame can reference operator-internal scratch tables.
    */
  def release(blocking: Boolean = false): Int = {
    var n = 0
    val it = tracked.iterator()
    while (it.hasNext) {
      val r = it.next()
      it.remove()
      if (r.getStorageLevel != StorageLevel.NONE) {
        r.unpersist(blocking)
        n += 1
      }
    }
    n
  }

  /** Registry size (test hook). */
  def trackedCount: Int = tracked.size
}
