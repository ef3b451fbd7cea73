package graft.operators

import graft.SparkSpec
import graft.sources.SnapshotStore
import org.apache.spark.sql.functions._

/** The commit-maintained SQ sidecar: index meta stamps the exact source
  * version it encodes; probes refresh-or-refuse on staleness, pure
  * appends refresh O(delta) through the change feed, DML triggers a
  * one-commit re-encode — the index is consistent or behind, never
  * silently wrong (the r14 gap this closes).
  */
class VectorIndexSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(tag: String): (String, String) = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-vidx-$tag").toString
    (s"file:$d/emb", s"file:$d/sq")
  }

  /** n deterministic float vectors; id 0 is the query. */
  private def vecs(ids: Seq[Long]) = ids.map { i =>
    (i, Array.tabulate(8)(j => (math.sin(i * 17 + j).toFloat)))
  }.toDF("vec_id", "embedding")

  test("probe == sqTopK on the same rows; fresh probes never rewrite") {
    val (tbl, idx) = fresh("base")
    SnapshotStore.append(vecs(0L to 50L), tbl, statsCols = Seq("vec_id"))
    VectorIndex.sqRefresh(spark, tbl, "vec_id", "embedding", idx)
    val viaIndex = VectorIndex.sqProbeIndexed(spark, tbl, "vec_id", "embedding",
      idx, queryId = 0L, k = 5, candidates = 20).collect().toSeq
    val direct = Similarity.sqTopK(vecs(0L to 50L), "vec_id", "embedding",
      queryId = 0L, k = 5, candidates = 20).collect().toSeq
    assert(viaIndex === direct)
    val v = SnapshotStore.latestVersion(spark, idx)
    VectorIndex.sqProbeIndexed(spark, tbl, "vec_id", "embedding",
      idx, queryId = 0L, k = 5, candidates = 20).collect()
    assert(SnapshotStore.latestVersion(spark, idx) === v,
      "a fresh probe must not commit anything")
  }

  test("pure appends refresh O(delta): index APPENDS, new vectors rank") {
    val (tbl, idx) = fresh("append")
    SnapshotStore.append(vecs(0L to 30L), tbl, statsCols = Seq("vec_id"))
    VectorIndex.sqRefresh(spark, tbl, "vec_id", "embedding", idx)
    // land a vector IDENTICAL to the query: must become the top hit
    SnapshotStore.append(
      Seq((999L, Array.tabulate(8)(j => math.sin(j).toFloat)))
        .toDF("vec_id", "embedding"), tbl)
    val top = VectorIndex.sqProbeIndexed(spark, tbl, "vec_id", "embedding",
      idx, queryId = 0L, k = 3, candidates = 20).collect()
    assert(top.head.getLong(0) === 999L, s"got ${top.toSeq}")
    // the refresh was INCREMENTAL: an append commit, not a rebuild
    assert(SnapshotStore.history(spark, idx).head._2 === "append")
    // and the delta commit carried the new stamp atomically
    assert(SnapshotStore.state(spark, idx).meta(VectorIndex.SourceVersionKey)
      === SnapshotStore.latestVersion(spark, tbl).toString)
  }

  test("IVF sidecar: probe == ivfTrainedTopK when fresh; appends assign O(delta); DML retrains") {
    val (tbl, idx) = fresh("ivf")
    SnapshotStore.append(vecs(0L to 40L).repartition(2), tbl,
      statsCols = Seq("vec_id"))
    SnapshotStore.setDvEnabled(spark, tbl, enabled = true)
    VectorIndex.ivfRefresh(spark, tbl, "vec_id", "embedding", idx,
      numCentroids = 4)
    val viaIndex = VectorIndex.ivfProbeIndexed(spark, tbl, "vec_id",
      "embedding", idx, queryId = 0L, k = 5, probes = 2, numCentroids = 4)
      .collect().toSeq
    val direct = Similarity.ivfTrainedTopK(vecs(0L to 40L), "vec_id",
      "embedding", queryId = 0L, k = 5, numCentroids = 4, probes = 2)
      .collect().toSeq
    assert(viaIndex === direct)
    // pure append: the identical-to-query vector assigns to the query's
    // own nearest centroid map-side (no retrain) and must rank first
    SnapshotStore.append(
      Seq((999L, Array.tabulate(8)(j => math.sin(j).toFloat)))
        .toDF("vec_id", "embedding"), tbl)
    val top = VectorIndex.ivfProbeIndexed(spark, tbl, "vec_id", "embedding",
      idx, queryId = 0L, k = 3, probes = 2, numCentroids = 4).collect()
    assert(top.head.getLong(0) === 999L, s"got ${top.toSeq}")
    assert(SnapshotStore.history(spark, s"$idx/assignments").head._2 === "append",
      "a pure-append delta must not retrain")
    // merge-on-read delete -> stale stamp -> refusal without autoRefresh,
    // full retrain with it, equal to a from-scratch train on current rows
    SnapshotStore.delete(spark, tbl, col("vec_id") === 999L)
    intercept[IllegalStateException] {
      VectorIndex.ivfProbeIndexed(spark, tbl, "vec_id", "embedding", idx,
        queryId = 0L, k = 5, probes = 2, numCentroids = 4, autoRefresh = false)
    }
    val after = VectorIndex.ivfProbeIndexed(spark, tbl, "vec_id", "embedding",
      idx, queryId = 0L, k = 5, probes = 2, numCentroids = 4).collect().toSeq
    assert(SnapshotStore.history(spark, s"$idx/assignments").head._2 === "overwrite")
    val scratch = Similarity.ivfTrainedTopK(SnapshotStore.snapshot(spark, tbl),
      "vec_id", "embedding", queryId = 0L, k = 5, numCentroids = 4, probes = 2)
      .collect().toSeq
    assert(after === scratch)
  }

  test("IVF pair can never be read torn: probe + delta-assign pin the STAMPED centroids version") {
    val (tbl, idx) = fresh("torn")
    SnapshotStore.append(vecs(0L to 40L).repartition(2), tbl,
      statsCols = Seq("vec_id"))
    VectorIndex.ivfRefresh(spark, tbl, "vec_id", "embedding", idx,
      numCentroids = 4)
    val before = VectorIndex.ivfProbeIndexed(spark, tbl, "vec_id", "embedding",
      idx, queryId = 0L, k = 5, probes = 2, numCentroids = 4).collect().toSeq
    // simulate a force-retrain crash between the two overwrites: the NEW
    // (here: garbage — negated) centroids landed, assignments did not
    val cenT = s"$idx/centroids"
    SnapshotStore.overwrite(
      SnapshotStore.snapshot(spark, cenT)
        .withColumn("cv", transform(col("cv"), x => -x)), cenT)
    val stamped = SnapshotStore.state(spark, s"$idx/assignments")
      .meta(VectorIndex.CentroidsVersionKey).toLong
    assert(stamped < SnapshotStore.latestVersion(spark, cenT),
      "the crash left a newer centroids version than the stamp names")
    // the probe reads centroids asOf the stamp — answer unchanged
    val after = VectorIndex.ivfProbeIndexed(spark, tbl, "vec_id", "embedding",
      idx, queryId = 0L, k = 5, probes = 2, numCentroids = 4).collect().toSeq
    assert(after === before, "probe mixed index generations")
    // and an O(delta) refresh assigns against the STAMPED centroids too:
    // the identical-to-query vector still lands in the query's cell
    SnapshotStore.append(
      Seq((999L, Array.tabulate(8)(j => math.sin(j).toFloat)))
        .toDF("vec_id", "embedding"), tbl)
    val top = VectorIndex.ivfProbeIndexed(spark, tbl, "vec_id", "embedding",
      idx, queryId = 0L, k = 3, probes = 2, numCentroids = 4).collect()
    assert(top.head.getLong(0) === 999L, s"got ${top.toSeq}")
    assert(SnapshotStore.history(spark, s"$idx/assignments").head._2 === "append")
  }

  test("IVF drift policy: appends under the fraction assign O(delta), past it retrain; delta files stay cid-clustered") {
    val (tbl, idx) = fresh("drift")
    val asgT = s"$idx/assignments"
    SnapshotStore.append(vecs(0L to 19L).repartition(2), tbl,
      statsCols = Seq("vec_id"))
    VectorIndex.ivfRefresh(spark, tbl, "vec_id", "embedding", idx,
      numCentroids = 4)
    assert(SnapshotStore.state(spark, asgT)
      .meta(VectorIndex.TrainedRowsKey) === "20")
    val liveBefore = SnapshotStore.state(spark, asgT).live.map(_.path).toSet
    // +5 rows = 25% of the trained 20: below the 0.5 default → append
    SnapshotStore.append(vecs(100L to 104L), tbl)
    VectorIndex.ivfRefresh(spark, tbl, "vec_id", "embedding", idx,
      numCentroids = 4)
    assert(SnapshotStore.history(spark, asgT).head._2 === "append")
    assert(SnapshotStore.state(spark, asgT)
      .meta(VectorIndex.TrainedRowsKey) === "20",
      "an O(delta) append must carry the trained count forward unchanged")
    // the delta files are cid-clustered: pairwise-disjoint cid ranges
    val deltaFiles = SnapshotStore.state(spark, asgT).live
      .filterNot(f => liveBefore(f.path))
    val ranges = deltaFiles.flatMap(_.stats.get("cid")).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(aMax <= bMin, s"delta files overlap on cid: $ranges")
      case _ =>
    }
    // +10 more = 15/20 = 75% appended since train: past 0.5 → retrain
    SnapshotStore.append(vecs(200L to 209L), tbl)
    VectorIndex.ivfRefresh(spark, tbl, "vec_id", "embedding", idx,
      numCentroids = 4)
    assert(SnapshotStore.history(spark, asgT).head._2 === "overwrite",
      "past the drift fraction the refresh must retrain")
    assert(SnapshotStore.state(spark, asgT)
      .meta(VectorIndex.TrainedRowsKey) === "35")
    // and the retrained probe equals a from-scratch train on current rows
    val via = VectorIndex.ivfProbeIndexed(spark, tbl, "vec_id", "embedding",
      idx, queryId = 0L, k = 5, probes = 2, numCentroids = 4).collect().toSeq
    val scratch = Similarity.ivfTrainedTopK(SnapshotStore.snapshot(spark, tbl),
      "vec_id", "embedding", queryId = 0L, k = 5, numCentroids = 4, probes = 2)
      .collect().toSeq
    assert(via === scratch)
  }

  test("scaled IVF sidecar: probe == direct ivfTrainScaled; appends assign two-level O(delta)") {
    val (tbl, idx) = fresh("ivfscaled")
    val kOf = Some((n: Long) => Similarity.scaledCentroids(n).toLong)
    SnapshotStore.append(vecs(0L to 60L).repartition(2), tbl,
      statsCols = Seq("vec_id"))
    VectorIndex.ivfRefresh(spark, tbl, "vec_id", "embedding", idx,
      numCentroids = 0, kOf = kOf)
    val viaIndex = VectorIndex.ivfProbeIndexed(spark, tbl, "vec_id",
      "embedding", idx, queryId = 0L, k = 5, probes = 2, numCentroids = 0,
      kOf = kOf).collect().toSeq
    val (cent, asg) = Similarity.ivfTrainScaled(vecs(0L to 60L), "vec_id",
      "embedding", n => Similarity.scaledCentroids(n).toLong)
    val direct = Similarity.ivfProbe(cent, asg, queryId = 0L, k = 5, probes = 2)
      .collect().toSeq
    assert(viaIndex === direct,
      "the persisted scaled index must answer exactly like the inline scaled trainer")
    // pure append under the drift fraction: two-level delta assignment —
    // an exact twin of the query vector lands in the query's own cell
    // (same signature => same candidate centroids => same argmax), so it
    // must rank first without a retrain
    SnapshotStore.append(
      Seq((999L, Array.tabulate(8)(j => math.sin(j).toFloat)))
        .toDF("vec_id", "embedding"), tbl)
    val top = VectorIndex.ivfProbeIndexed(spark, tbl, "vec_id", "embedding",
      idx, queryId = 0L, k = 3, probes = 2, numCentroids = 0, kOf = kOf)
      .collect()
    assert(top.head.getLong(0) === 999L, s"got ${top.toSeq}")
    assert(SnapshotStore.history(spark, s"$idx/assignments").head._2 === "append",
      "a pure-append delta must not retrain the scaled index")
    // twin co-assignment, explicitly: 999 carries the cid of vec 0
    val cids = SnapshotStore.snapshot(spark, s"$idx/assignments")
      .filter(col("vec_id").isin(0L, 999L))
      .select(col("vec_id"), col("cid")).collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue()).toMap
    assert(cids(999L) === cids(0L), s"twin split across cells: $cids")
  }

  test("DML on the source re-encodes; stale probe refuses when autoRefresh=false") {
    val (tbl, idx) = fresh("dml")
    SnapshotStore.append(vecs(0L to 30L).repartition(2), tbl,
      statsCols = Seq("vec_id"))
    SnapshotStore.setDvEnabled(spark, tbl, enabled = true)
    VectorIndex.sqRefresh(spark, tbl, "vec_id", "embedding", idx)
    val before = VectorIndex.sqProbeIndexed(spark, tbl, "vec_id", "embedding",
      idx, queryId = 0L, k = 5, candidates = 20).collect().map(_.getLong(0))
    val victim = before.head
    // merge-on-read delete of the current top neighbor
    SnapshotStore.delete(spark, tbl, col("vec_id") === victim)
    val stale = intercept[IllegalStateException] {
      VectorIndex.sqProbeIndexed(spark, tbl, "vec_id", "embedding",
        idx, queryId = 0L, k = 5, candidates = 20, autoRefresh = false)
    }
    assert(stale.getMessage.contains("stale"))
    val after = VectorIndex.sqProbeIndexed(spark, tbl, "vec_id", "embedding",
      idx, queryId = 0L, k = 5, candidates = 20).collect().map(_.getLong(0))
    assert(!after.contains(victim), "deleted vector must leave the neighbors")
    // a delete is not append-shaped: the refresh was a full re-encode
    assert(SnapshotStore.history(spark, idx).head._2 === "overwrite")
    // and equals a from-scratch answer on the post-DML table
    val scratch = Similarity.sqTopK(SnapshotStore.snapshot(spark, tbl),
      "vec_id", "embedding", queryId = 0L, k = 5, candidates = 20)
      .collect().map(_.getLong(0))
    assert(after.toSeq === scratch.toSeq)
  }
}
