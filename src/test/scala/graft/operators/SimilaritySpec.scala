package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),   // identical to query
    (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),   // orthogonal
    (3L, Seq(-1.0f, 0.0f, 0.0f, 0.0f)),  // opposite
    (4L, Seq(1.0f, 1.0f, 0.0f, 0.0f))    // 45 degrees
  ).toDF("vec_id", "embedding")

  test("cosine: identical→1, orthogonal→0, opposite→-1") {
    val c = vecs.filter(col("vec_id") =!= 0)
      .crossJoin(vecs.filter(col("vec_id") === 0).select(col("embedding").as("q")))
      .select(col("vec_id"), round(Similarity.cosine(col("embedding"), col("q")), 6).as("cos"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos")).toMap
    assert(c(1L) == 1.0 && c(2L) == 0.0 && c(3L) == -1.0)
    assert(math.abs(c(4L) - 0.707107) < 1e-6)
  }

  test("native cosine_sim expression is bit-identical to the HOF fold") {
    graft.plans.GraftExtensions.register(spark)
    val pairs = vecs.select(col("embedding").as("a"))
      .crossJoin(vecs.select(col("embedding").as("b")))
    val diffs = pairs.select(
      Similarity.cosine(col("a"), col("b")).as("hof"),
      Similarity.cosineNative(col("a"), col("b")).as("native"))
      .filter(col("hof") =!= col("native"))
    assert(diffs.count() == 0)
  }

  test("sqTopK: int8 candidate rank + exact re-rank recalls the brute-force set") {
    val sf = "/root/testdata/sf0.001"
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val sq = Similarity.sqTopK(emb, "vec_id", "embedding", 0L,
      k = 10, candidates = 40)
    val rows = sq.collect()
    val got = rows.map(_.getAs[Long]("vec_id")).toSet
    assert(rows.length === 10)
    // the exact re-rank over 40 int8-ranked finalists should recover
    // most of the true top-10 (deterministic on this corpus)
    assert((exact intersect got).size >= 7,
      s"sq recall too low: exact=$exact sq=$got")
    // final order is by exact cosine desc — the re-rank really ran
    val cosines = rows.map(_.getAs[Double]("cos")).toSeq
    assert(cosines === cosines.sorted.reverse)
  }

  test("sqEncode/sqProbe: persisted byte codes answer identically to sqTopK") {
    val sf = "/root/testdata/sf0.001"
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val idx = java.nio.file.Files.createTempDirectory("graft-sqidx-spec").toString
    Similarity.sqEncode(emb, "vec_id", "embedding", Some(idx))
    val codes = spark.read.parquet(s"$idx/sq_codes")
    // the persisted artifact really is byte codes (the 4x claim)
    assert(codes.schema("q").dataType ===
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.ByteType))
    val probed = Similarity.sqProbe(codes, emb, "vec_id", "embedding", 0L, 10, 40)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    val inline = Similarity.sqTopK(emb, "vec_id", "embedding", 0L, 10, 40)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(probed === inline, "index probe must equal the inline form")
  }

  test("bruteForceTopK ranks by cosine desc, excludes the query") {
    val top = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", 0L, 3)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(top == Seq(1L, 4L, 2L))
  }

  test("ivfTopK only probes the query's sign bucket") {
    val top = Similarity.ivfTopK(vecs, "vec_id", "embedding", 0L, 10, bucketBits = 2)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    // bucket(query) = bit0 set (dim1>0), bit1 unset → ids 1 (same bucket); 4 has both bits
    assert(top == Seq(1L))
  }

  test("hyperplaneBucket: deterministic, mixes dimensions, balanced on real data") {
    graft.plans.GraftExtensions.register(spark)
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val bucketed = emb.select(
      Similarity.hyperplaneBucket(col("embedding"), bits = 4, dim = dim).as("b"))
    // deterministic across evaluations
    val c1 = bucketed.groupBy("b").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c2 = bucketed.groupBy("b").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c1 == c2)
    // balanced-ish: with 16 buckets over n rows, no bucket hogs > 40%
    val n = c1.values.sum
    assert(c1.size >= 8, s"only ${c1.size} of 16 buckets populated")
    assert(c1.values.max < n * 0.4, s"worst bucket ${c1.values.max} of $n")
  }

  test("cosinePairsBucketed(hyperplane) == within-bucket brute force") {
    graft.plans.GraftExtensions.register(spark)
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val bucket = Similarity.hyperplaneBucket(col("embedding"), bits = 4, dim = dim)
    val got = Similarity.cosinePairsBucketed(emb, "vec_id", "embedding", bucket, minCosine = 0.3)
      .select("vec_a", "vec_b", "cos").as[(Long, Long, Double)].collect().toSet
    // reference: all pairs sharing a bucket with cosine >= threshold
    val b = emb.select(col("vec_id"), col("embedding"), bucket.as("bk"))
    val want = b.as("x").join(b.as("y"), col("x.bk") === col("y.bk") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id"), col("y.vec_id"),
        round(Similarity.cosine(col("x.embedding"), col("y.embedding")), 6).as("cos"))
      .filter(col("cos") >= 0.3)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("cosinePairs honors the bucket boundary and threshold") {
    val pairs = Similarity.cosinePairs(vecs, "vec_id", "embedding",
      bucketBits = 2, minCosine = 0.9)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(pairs == Set((0L, 1L))) // 0-1 identical and same bucket
  }

  test("scaledProbes derives the IVF probe count from the centroid count (recall-calibrated)") {
    // probes = ceil(sqrt k), floored at 2, capped at k (a tiny index
    // probes everything — exact). Calibration (ProbesRecallProbe,
    // ROADMAP r18): sqrt-k lifts worst-case (near-uniform vectors)
    // recall@10 from fixed-2's ~0.53 to ~0.7 and is exact on clustered
    // corpora, while the per-query candidate fraction probes/k ~
    // n^(-1/4) still VANISHES at scale.
    assert(Similarity.scaledProbes(1) === 1)
    assert(Similarity.scaledProbes(2) === 2)
    assert(Similarity.scaledProbes(4) === 2)
    assert(Similarity.scaledProbes(16) === 4)
    assert(Similarity.scaledProbes(78) === 9)     // sf0.1 embeddings' k
    assert(Similarity.scaledProbes(10000) === 100)
    // 100 TB shape: 10^9 vectors -> ~31623 centroids -> 178 probes,
    // scanning ~0.56% of the corpus per query
    assert(Similarity.scaledProbes(31623) === 178)
    for (k <- Seq(1L, 3L, 10L, 500L, 123456L)) {
      val p = Similarity.scaledProbes(k)
      assert(p >= 1 && p <= k, s"k=$k probes=$p out of range")
    }
  }

  test("scaledBucketBits pins per-bucket occupancy: bits grow with the corpus, candidate volume stays linear") {
    // the derivation: smallest bits with n/2^bits <= target, floored at 1
    assert(Similarity.scaledBucketBits(100, 256) === 1)   // tiny corpus
    assert(Similarity.scaledBucketBits(256, 256) === 1)
    assert(Similarity.scaledBucketBits(257, 256) === 1)
    assert(Similarity.scaledBucketBits(513, 256) === 2)
    assert(Similarity.scaledBucketBits(2000, 256) === 3)
    assert(Similarity.scaledBucketBits(20000, 256) === 7)
    assert(Similarity.scaledBucketBits(2000000, 256) === 13)
    // 100 TB shape: 10^11 vectors still derive a usable plane count
    assert(Similarity.scaledBucketBits(100000000000L, 256) === 29)
    // EXACT power-of-two corpora (the r16 ADVICE boundary): n/target =
    // 2^m must derive m bits, not m+1 — float ln-ratio overshot here,
    // diverging from the SQL oracle's ceil(log2); integer arithmetic
    // on both sides closes the seam
    assert(Similarity.scaledBucketBits(256L << 29, 256) === 29)
    assert(Similarity.scaledBucketBits(256L << 31, 256) === 31)
    assert(Similarity.scaledBucketBits(256L << 39, 256) === 39)
    assert(Similarity.scaledBucketBits(256L << 47, 256) === 47)
    assert(Similarity.scaledBucketBits((256L << 31) + 1, 256) === 32)
    // invariant: expected occupancy n/2^bits <= target (within the
    // integral-bits rounding), and one fewer bit would exceed it
    for (n <- Seq(1000L, 12345L, 999999L, 12345678L)) {
      val b = Similarity.scaledBucketBits(n, 256)
      assert(n.toDouble / (1L << b) <= 256.0, s"n=$n bits=$b overshoots")
      if (b > 1) assert(n.toDouble / (1L << (b - 1)) > 256.0,
        s"n=$n bits=$b is wider than needed")
    }
  }

  test("cosinePairsScaled: sound at any width, planted dups found across widths, volume bounded") {
    graft.plans.GraftExtensions.register(spark)
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    // plant two exact duplicates of existing vectors under fresh ids
    val planted = emb.filter(col("vec_id").isin(3L, 7L))
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val corpus = emb.unionByName(planted).localCheckpoint()
    val exact = corpus.as("x").join(corpus.as("y"),
        col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        round(Similarity.cosine(col("x.embedding"), col("y.embedding")), 6).as("cos"))
      .filter(col("cos") >= 0.5)
      .as[(Long, Long, Double)].collect().toSet
    def at(bits: Int): Set[(Long, Long, Double)] =
      Similarity.cosinePairsBucketed(corpus, "vec_id", "embedding",
        Similarity.hyperplaneBucket(col("embedding"), bits, dim), 0.5)
        .select("vec_a", "vec_b", "cos").as[(Long, Long, Double)].collect().toSet
    val scaled = Similarity.cosinePairsScaled(corpus, "vec_id", "embedding",
      minCosine = 0.5, targetBucketRows = 256)
      .select("vec_a", "vec_b", "cos").as[(Long, Long, Double)].collect().toSet
    // SOUNDNESS at every width: emitted pairs are a subset of the exact
    // all-pairs set — bucketing trades recall, never correctness
    for ((s, tag) <- Seq((at(2), "2"), (at(6), "6"), (at(10), "10"), (scaled, "scaled")))
      assert(s.subsetOf(exact), s"bits=$tag emitted a non-pair")
    // PLANTED-DUP EQUIVALENCE across widths: an exact duplicate agrees
    // with its twin on EVERY sign plane, so the pair class the operator
    // exists for survives any bits — 2, 6, 10, and the derived width
    // all find both planted pairs
    for ((s, tag) <- Seq((at(2), "2"), (at(6), "6"), (at(10), "10"), (scaled, "scaled"))) {
      assert(s.exists { case (a, b, _) => a == 3L && b == 100003L },
        s"bits=$tag lost planted dup 3")
      assert(s.exists { case (a, b, _) => a == 7L && b == 100007L },
        s"bits=$tag lost planted dup 7")
    }
    // VOLUME BOUND: the derived width keeps every bucket near the target
    // (the property that makes the candidate volume ~n·target/2, linear)
    val n = corpus.count()
    val bits = Similarity.scaledBucketBits(n, 256)
    val occ = corpus.select(Similarity.hyperplaneBucket(
        col("embedding"), bits, dim).as("bk"))
      .groupBy(col("bk")).count()
      .agg(sum((col("count") * (col("count") - 1) / 2).cast("long")))
      .head.getLong(0)
    assert(occ <= n * 256, s"candidate volume $occ exceeds n*target=${n * 256}")
  }

  test("persisted IVF index: train once to disk, probe reads it back identically") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val inline = Similarity.ivfTrainedTopK(emb, "vec_id", "embedding",
      queryId = 3L, k = 5, numCentroids = 4, probes = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // train persists the index artifacts…
    val (c1, a1) = Similarity.ivfTrain(emb, "vec_id", "embedding",
      numCentroids = 4, indexPath = Some(s"$tmp/ix"))
    assert(spark.read.parquet(s"$tmp/ix/centroids").count() == 4)
    assert(spark.read.parquet(s"$tmp/ix/assignments").count() == emb.count())
    // …and probing the REREAD tables gives the inline result: the index
    // is a durable artifact, trained once and probed per query
    val centroids = spark.read.parquet(s"$tmp/ix/centroids")
    val asg = spark.read.parquet(s"$tmp/ix/assignments")
    val persisted = Similarity.ivfProbe(centroids, asg, queryId = 3L, k = 5, probes = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(persisted == inline)
  }

  test("hybridTopK ≡ brute force restricted to the allowed ids") {
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val allowed = (0L until 500L by 3L).toDF("vec_id") // every 3rd id
    val hybrid = Similarity.hybridTopK(e, allowed, "vec_id", "embedding", 0L, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // reference: plain semi join then the existing brute-force ranking
    val restricted = Similarity.bruteForceTopK(
      e.join(allowed.union(Seq(0L).toDF("vec_id")), Seq("vec_id"), "left_semi"),
      "vec_id", "embedding", 0L, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(hybrid == restricted, s"$hybrid vs $restricted")
    // every returned id satisfies the predicate; the query id never returns
    assert(hybrid.forall { case (id, _) => id % 3 == 0 && id != 0L })
  }

  test("kmeansAssign separates well-separated direction blobs") {
    import org.apache.spark.sql.functions._
    // two tight cones around orthogonal axes; ids interleave so rank
    // seeding starts with one vector from each blob
    val rows = (0 until 40).map { i =>
      val base = if (i % 2 == 0) Array(10f, 0.1f * (i % 5), 0f)
                 else Array(0f, 0.1f * (i % 5), 10f)
      (i.toLong, base)
    }
    val df = spark.createDataFrame(rows).toDF("vec_id", "embedding")
    val out = Similarity.kmeansAssign(df, "vec_id", "embedding", k = 2, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val evenClusters = out.filter(_._1 % 2 == 0).values.toSet
    val oddClusters = out.filter(_._1 % 2 == 1).values.toSet
    assert(evenClusters.size == 1 && oddClusters.size == 1 && evenClusters != oddClusters,
      s"blobs not separated: even=$evenClusters odd=$oddClusters")
  }

  test("semDedup: within-cluster near-dups drop keep-lowest; cross-cluster twins both survive") {
    import org.apache.spark.sql.functions._
    // two orthogonal direction blobs; ids interleave so rank seeding
    // (k=2) starts one centroid in each. Blob members are near-parallel
    // (cos ≈ 1 within a blob, ≈ 0 across), so within each cluster only
    // the LOWEST id survives — even across blobs' identical geometry.
    val rows = (0 until 12).map { i =>
      val base = if (i % 2 == 0) Array(10f, 0.01f * i, 0f)
                 else Array(0f, 0.01f * i, 10f)
      (i.toLong, base)
    }
    val df = spark.createDataFrame(rows).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(df, "vec_id", "embedding",
        k = 2, iters = 2, minCosine = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val kept = out.filter(_._3).map(_._1).toSet
    assert(kept === Set(0L, 1L),
      s"one exemplar per cluster, the lowest id: kept $kept")
    // dropped rows still report their cluster (curation joins on it)
    val clustersOf = out.groupBy(_._1 % 2).map { case (par, xs) =>
      par -> xs.map(_._2).toSet }
    assert(clustersOf.values.forall(_.size == 1),
      s"each blob maps to one cluster: $clustersOf")
    // a lone vector (no lower-id neighbor above threshold) always keeps
    assert(out.length === 12 && out.count(_._3) === 2)
  }

  test("semDedupScaled: derived k bounds cluster occupancy; keep-lowest holds; ids are seed ids") {
    import org.apache.spark.sql.functions._
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    // plant an exact duplicate of vec 3 under a HIGHER id: same cluster
    // (identical vector -> identical argmax), keep-lowest must drop it
    val corpus = emb.unionByName(
      emb.filter(col("vec_id") === 3L)
        .select((col("vec_id") + 700000L).as("vec_id"), col("embedding")))
      .localCheckpoint()
    val n = corpus.count()
    val out = Similarity.semDedupScaled(corpus, "vec_id", "embedding",
      minCosine = 0.9, targetClusterRows = 64)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.length === n)
    val planted = rows.find(_._1 == 700003L).get
    val original = rows.find(_._1 == 3L).get
    assert(planted._2 === original._2, "identical vectors must share a cluster")
    assert(!planted._3 && original._3,
      "keep-lowest: the planted higher-id twin drops, the original keeps")
    // derived k: seeds are hash-fate selected at ppm = k/n (EXPECTED k,
    // binomial variance — not exactly k), so the cluster count tracks
    // ceil(n/target) within a loose factor; occupancy staying bounded
    // near target is the real linearity invariant
    val k = math.ceil(n.toDouble / 64).toInt
    val occ = rows.groupBy(_._2).map(_._2.length)
    assert(occ.size >= 1 && occ.size <= 3 * k + 1,
      s"cluster count ${occ.size} far off the expected ~$k seeds")
    assert(occ.max <= 8 * 64,
      s"a cluster at ${occ.max} rows defeats the occupancy bound")
    // cluster ids are SEED VECTOR ids (ivfTrain convention): every id
    // labels an actual corpus vector
    val ids = rows.map(_._1).toSet
    assert(rows.map(_._2).toSet.subsetOf(ids))
  }


  test("annAssign: two-level == brute-force argmax when every row's bucket holds its centroid; orphans fall back to the longest occupied prefix") {
    import org.apache.spark.sql.functions._
    // hand-built signatures isolate the join logic from the plane math:
    // bits = 2, centroids occupy buckets {2, 3}; rows in {2, 3} take the
    // common path, rows in {0, 1} are ORPHANS (no centroid shares their
    // full signature, nor their 1-bit prefix 0b0) and must fall back to
    // L = 0 — the full brute-force candidate set
    val cents = spark.createDataFrame(Seq(
      (10L, Array(1.0, 0.0), 2L),   // bucket 0b10
      (20L, Array(0.0, 1.0), 3L),   // bucket 0b11
      (30L, Array(1.0, 1.0), 3L)    // bucket 0b11
    )).toDF("cid", "cv", "__csig")
    val rows = spark.createDataFrame(Seq(
      (1L, Array(1.0, 0.1), 2L),    // matched: only candidate is cid 10
      (2L, Array(0.1, 1.0), 3L),    // matched: candidates {20, 30} → 20
      (3L, Array(1.0, 0.9), 3L),    // matched: candidates {20, 30} → 30
      (4L, Array(1.0, 0.0), 0L),    // orphan → all cents → exact argmax 10
      (5L, Array(0.0, 1.0), 1L)     // orphan → all cents → exact argmax 20
    )).toDF("vec_id", "v", "__rsig")
    val out = Similarity.annAssign(rows, cents, bits = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === Map(1L -> 10L, 2L -> 20L, 3L -> 30L, 4L -> 10L, 5L -> 20L))
    // totality: every row assigned exactly once
    assert(Similarity.annAssign(rows, cents, bits = 2).count() === rows.count())
    // LONGEST prefix beats L=0: a centroid in bucket 0b01 gives the
    // sig-1 orphan a 1-bit-prefix (0b0) match — its candidate set is
    // now {that centroid} only, even though cid 20 is globally nearer
    val cents2 = cents.unionByName(spark.createDataFrame(Seq(
      (40L, Array(1.0, 0.0), 1L))).toDF("cid", "cv", "__csig"))
    val out2 = Similarity.annAssign(rows, cents2, bits = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out2(5L) === 40L,
      "orphan must probe its longest occupied prefix, not the global set")
    assert(out2(4L) === 40L) // full-sig match at bucket 0 is still absent; prefix 0b0 now holds 40
  }

  test("annAssign bits=0 degenerates to the exact brute-force argmax") {
    import org.apache.spark.sql.functions._
    val cents = spark.createDataFrame(Seq(
      (10L, Array(1.0, 0.0), 0L), (20L, Array(0.0, 1.0), 0L)
    )).toDF("cid", "cv", "__csig")
    val rows = spark.createDataFrame(Seq(
      (1L, Array(0.9, 0.1), 0L), (2L, Array(0.1, 0.9), 0L),
      (3L, Array(1.0, 1.0), 0L) // tie at cos=0.707107 both sides → min cid
    )).toDF("vec_id", "v", "__rsig")
    val out = Similarity.annAssign(rows, cents, bits = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === Map(1L -> 10L, 2L -> 20L, 3L -> 10L))
  }

  test("ivfTrainScaled: total assignment, seed-id clusters, exact twins share a cluster, probe shape holds") {
    import org.apache.spark.sql.functions._
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    // plant an exact duplicate under a higher id: identical vector →
    // identical signature at ANY width → identical candidate set →
    // identical argmax (rounded cosine ties break to the same min cid)
    val corpus = emb.unionByName(
      emb.filter(col("vec_id") === 5L)
        .select((col("vec_id") + 900000L).as("vec_id"), col("embedding")))
      .localCheckpoint()
    val n = corpus.count()
    val (cent, asg) = Similarity.ivfTrainScaled(corpus, "vec_id", "embedding",
      m => Similarity.scaledCentroids(m)) // k = ceil(√n) → bits >= 1 here
    val rows = asg.select(col("vec_id"), col("cid")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length === n, "every vector assigned")
    assert(rows.map(_._1).distinct.length === n, "exactly once")
    val ids = rows.map(_._1).toSet
    assert(rows.map(_._2).toSet.subsetOf(ids), "cluster ids are seed vector ids")
    val byId = rows.toMap
    assert(byId(900005L) === byId(5L), "exact twins share a cluster")
    // the trained pair feeds ivfProbe unchanged (ivfTrain's contract)
    val top = Similarity.ivfProbe(cent, asg, queryId = 0L, k = 5, probes = 2)
      .collect()
    assert(top.nonEmpty && top.length <= 5)
  }

  test("kmeansAssign: zero iterations assigns against the seed vectors; empty clusters drop") {
    import org.apache.spark.sql.functions._
    // all vectors identical to vector 0 → every row lands in cluster 0
    // and clusters 1..k-1 lose all members after one update round
    val df = spark.createDataFrame((0 until 10).map(i => (i.toLong, Array(1f, 2f, 3f))))
      .toDF("vec_id", "embedding")
    val zero = Similarity.kmeansAssign(df, "vec_id", "embedding", k = 3, iters = 0)
      .collect().map(_.getLong(1)).toSet
    assert(zero == Set(0L)) // cos ties at 1.0 for all seeds → lowest cid wins
    val afterRound = Similarity.kmeansAssign(df, "vec_id", "embedding", k = 3, iters = 2)
      .collect().map(_.getLong(1)).toSet
    assert(afterRound == Set(0L))
  }

  test("farthest-first seeding recovers clusters that rank seeding collapses") {
    import org.apache.spark.sql.functions._
    // ADVERSARIAL id order: the 3 lowest ids all sit in blob A, so rank
    // seeding spends all 3 seeds there; three orthogonal blobs overall
    val rows = (0 until 30).map { i =>
      val blob = if (i < 3) 0 else i % 3
      val base = blob match {
        case 0 => Array(10f, 0f, 0.1f * (i % 4))
        case 1 => Array(0f, 10f, 0.1f * (i % 4))
        case _ => Array(0.1f * (i % 4), 0f, 10f)
      }
      (i.toLong, blob, base)
    }
    val df = spark.createDataFrame(rows).toDF("vec_id", "blob", "embedding")
    def purity(seeding: String): Int = {
      val out = Similarity.kmeansAssign(df, "vec_id", "embedding",
        k = 3, iters = 0, seeding = seeding)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      // clusters are pure iff each blob maps onto exactly one distinct cluster
      val byBlob = rows.groupBy(_._2).view.mapValues(_.map(r => out(r._1)).toSet)
      if (byBlob.values.forall(_.size == 1) &&
          byBlob.values.map(_.head).toSet.size == 3) 3
      else byBlob.values.map(_.head).toSet.size
    }
    // with zero Lloyd iterations the seeds ARE the model: rank seeding
    // cannot distinguish all three blobs, farthest-first must
    assert(purity("rank") < 3, "adversarial order unexpectedly fine for rank seeding")
    assert(purity("farthest") == 3, "farthest-first failed to spread seeds")
    // determinism: same seeds, same assignment, twice
    val a = Similarity.kmeansAssign(df, "vec_id", "embedding", 3, 1, "farthest").collect().toSeq
    val b = Similarity.kmeansAssign(df, "vec_id", "embedding", 3, 1, "farthest").collect().toSeq
    assert(a == b)
  }

  test("table-resident k-means equals the literal-centroid Lloyd loop, and trains in-plan") {
    import org.apache.spark.sql.functions._
    // irregular vectors (no symmetry to hide a tie-break bug): three
    // loose direction groups plus stragglers, adversarial id order
    val rows = (0 until 60).map { i =>
      val g = (i * 7 + 3) % 3
      val base = g match {
        case 0 => Array(5f + 0.3f * (i % 5), 1f, 0.2f * (i % 3))
        case 1 => Array(0.4f * (i % 4), 6f - 0.2f * (i % 7), 1f)
        case _ => Array(1f, 0.1f * (i % 6), 4f + 0.5f * (i % 2))
      }
      (i.toLong, base)
    }
    val df = spark.createDataFrame(rows).toDF("vec_id", "embedding")
    for (seeding <- Seq("rank", "farthest"); iters <- Seq(0, 1, 3)) {
      val table = Similarity.kmeansAssign(df, "vec_id", "embedding",
          k = 4, iters = iters, seeding = seeding)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
      val literal = Similarity.kmeansAssignLiteral(df, "vec_id", "embedding",
          k = 4, iters = iters, seeding = seeding)
        .select(col("vec_id"), col("cluster_id"), col("cos"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
      assert(table == literal,
        s"seeding=$seeding iters=$iters: table-resident and literal Lloyd diverge")
    }
    // the Lloyd rounds live IN the plan (vec_mean per round), not in
    // driver-collected literals — the literal form's final plan carries
    // zero vec_mean because training already happened on the driver
    def vecMeans(dfOut: org.apache.spark.sql.DataFrame): Int =
      "vec_mean".r.findAllIn(dfOut.queryExecution.optimizedPlan.toString).length
    assert(vecMeans(Similarity.kmeansAssign(df, "vec_id", "embedding", 4, 3)) >= 3,
      "table-resident training must keep its update rounds in the plan")
    assert(vecMeans(Similarity.kmeansAssignLiteral(df, "vec_id", "embedding", 4, 3)) == 0)
  }
}
