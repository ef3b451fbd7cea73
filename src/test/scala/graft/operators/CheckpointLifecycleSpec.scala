package graft.operators

import graft.SparkSpec
import graft.runtime.Checkpoints

/** Storage-block lifecycle of the operator-internal materialization
  * barriers: every `localCheckpoint` an operator takes must be freeable
  * — repeated executions of the dedup/similarity family in one JVM must
  * return the block manager to its baseline, not accumulate one dead
  * signature table per run (the r11–r13 bench phantom).
  */
class CheckpointLifecycleSpec extends SparkSpec {
  import spark.implicits._

  // enough docs with shared shingles that every stage of the family does
  // real work (pairs, clusters over multi-hop chains, postings)
  private def docs = (0L until 60L).map { i =>
    val base = s"shared prefix tokens alpha beta gamma delta epsilon run${i / 3}"
    (i, s"$base tail${i % 3} more tail content ${i % 7}")
  }.toDF("doc_id", "text")

  private def persisted: Int = spark.sparkContext.getPersistentRDDs.size

  test("repeated dedup executions return the block manager to baseline after release") {
    Checkpoints.release(blocking = true)
    val base = persisted
    (1 to 3).foreach { _ =>
      // one representative per materialization shape: signature table,
      // rare-postings table, band table, iterative CC frontier chain
      assert(Dedup.containmentPairs(docs, "doc_id", "text", dfCap = 30).count() >= 0)
      assert(Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        shingleN = 3, minJaccard = 0.2).count() >= 0)
      val pairs = Dedup.minHashPairs(docs, "doc_id", "text",
        numHashes = 8, shingleN = 3, rowsPerBand = 2)
      assert(Dedup.dupClusters(pairs, "doc_a", "doc_b", checkEvery = 2).count() >= 0)
      // terminal actions have run — everything tracked is scratch now
      Checkpoints.release(blocking = true)
      assert(persisted == base,
        s"storage blocks leaked: $persisted persisted RDDs vs baseline $base")
      assert(Checkpoints.trackedCount == 0)
    }
  }

  test("iterative CC with reliable state frees every frontier by itself (no harness release)") {
    Checkpoints.release(blocking = true)
    val base = persisted
    // a long chain forces many min-label rounds → many frontier tables;
    // with a statePath the loop's rolling release plus finish() must
    // leave NOTHING behind even without a global release
    val chain = (0L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_state").toString
    val out = Dedup.dupClusters(chain, "doc_a", "doc_b", maxIters = 20,
      statePath = Some(dir), checkEvery = 2)
    assert(out.count() == 13)
    assert(Checkpoints.trackedCount == 0,
      "statePath run left tracked checkpoints for the harness — rolling release broken")
    assert(persisted == base)
    // star variant: same contract, and its exceptAll convergence confirm
    // reads the PREVIOUS round after the next materialized — the rolling
    // release must come after that confirm, or the fixpoint round crashes
    val dir2 = java.nio.file.Files.createTempDirectory("graft_cc_state2").toString
    val star = Dedup.dupClustersStar(chain, "doc_a", "doc_b", maxIters = 20,
      statePath = Some(dir2))
    assert(star.count() == 13)
    assert(Checkpoints.trackedCount == 0)
    assert(persisted == base)
  }

  test("mid-loop the CC frontier chain holds O(1) checkpoints, not one per round") {
    Checkpoints.release(blocking = true)
    val base = persisted
    val chain = (0L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    // default (no statePath): the result frame still roots on the final
    // frontier checkpoint, and the edge table was freed on return — so a
    // >10-round job must finish holding exactly ONE persisted RDD
    val out = Dedup.dupClusters(chain, "doc_a", "doc_b", maxIters = 20, checkEvery = 2)
    assert(out.count() == 13)
    assert(persisted - base <= 1,
      s"CC loop accumulated ${persisted - base} persisted RDDs — rolling release broken")
    Checkpoints.release(blocking = true)
    assert(persisted == base)
  }

  test("clearSharedTables unpersists the shared pair/cluster checkpoints") {
    Checkpoints.release(blocking = true)
    graft.SparkEntry.clearSharedTables()
    val base = persisted
    graft.SparkEntry.buildSharedTables(spark, "/root/testdata/sf0.001")
    Checkpoints.release(blocking = true) // build scratch
    assert(persisted > base, "shared tables should hold checkpoint blocks while cached")
    graft.SparkEntry.clearSharedTables()
    assert(persisted == base,
      "clearSharedTables dropped references without unpersisting — blocks leaked")
  }
}
