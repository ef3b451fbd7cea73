package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "The  quick brown fox jumps over the lazy dog"), // exact dup modulo case/ws
    (3L, "the quick brown fox jumps over the sleepy dog"), // near dup
    (4L, "completely different content about spark engines and shuffles")
  ).toDF("doc_id", "text")

  test("exact dedup groups case/whitespace-normalized duplicates") {
    val out = Dedup.exact(docs, "doc_id", "text").collect()
    assert(out.length == 3)
    val dup = out.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dup.getAs[Long]("keep_id") == 1L)
  }

  test("minHash pairs: identical docs agree on every band; unrelated docs never pair") {
    val pairs = Dedup.minHashPairs(docs, "doc_id", "text",
      numHashes = 8, shingleN = 3, rowsPerBand = 2).collect()
    val exact = pairs.find(r => r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
    assert(exact.isDefined && exact.get.getAs[Long]("n_bands") == 4L)
    // unrelated doc 4 shares no shingle with anything → can never agree on a
    // band (a band is an md5 of signature slots, and no slot input is shared)
    assert(!pairs.exists(r => r.getAs[Long]("doc_b") == 4L || r.getAs[Long]("doc_a") == 4L))
  }

  test("minHash signatures of a superset doc share most slots (near-dup recall)") {
    val nearDocs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox jumps over the lazy dog today")
    ).toDF("doc_id", "text")
    val sigs = Dedup.minHashSignatures(nearDocs, "doc_id", "text", numHashes = 8, shingleN = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (0 until 8).map(j => r.getAs[Long](s"mh$j"))).toMap
    // doc 3's shingles are a superset: each min can only move down, and with
    // J=7/8 most slots must coincide
    val shared = sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b }
    assert(shared >= 4, s"only $shared/8 signature slots shared")
  }

  test("simHash: identical docs have identical signatures; near-dups are close") {
    val sh = Dedup.simHash(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sh(1L) == sh(2L))
    val hammingNear = java.lang.Long.bitCount(sh(1L) ^ sh(3L))
    val hammingFar = java.lang.Long.bitCount(sh(1L) ^ sh(4L))
    assert(hammingNear < hammingFar)
  }

  test("simHashPairsScaled: monotone prefix recall, exact dups at every width, derived width bounded") {
    val sf = "/root/testdata/sf0.001"
    val corpus0 = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    // plant an exact duplicate of doc 3 under a fresh id
    val corpus = corpus0.unionByName(
      corpus0.filter(col("doc_id") === 3L)
        .select((col("doc_id") + 900000L).as("doc_id"), col("text")))
      .localCheckpoint()
    def at(bits: Int): Set[(Long, Long)] =
      Dedup.simHashPairs(corpus, "doc_id", "text", bucketBits = bits,
        maxHamming = 24)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val scaled = Dedup.simHashPairsScaled(corpus, "doc_id", "text",
      maxHamming = 24, targetBucketRows = 256)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val (w2, w8, w16) = (at(2), at(8), at(16))
    // buckets are simhash PREFIXES: widening only splits buckets, so
    // recall is monotone in width (every wider answer nests)
    assert(w16.subsetOf(w8) && w8.subsetOf(w2),
      s"prefix recall must be monotone: |w2|=${w2.size} |w8|=${w8.size} |w16|=${w16.size}")
    // the pair class the operator exists for — identical simhash —
    // shares every prefix width, including the derived one
    for ((s, tag) <- Seq((w2, "2"), (w8, "8"), (w16, "16"), (scaled, "scaled")))
      assert(s.contains((3L, 900003L)), s"bits=$tag lost the exact dup")
    // the derived width == the explicit simHashPairs at that width
    // (delegation, pinned so the scaled surface can't drift), and it is
    // the scaledBucketBits derivation
    val bits = math.min(48,
      graft.operators.Similarity.scaledBucketBits(corpus.count(), 256))
    assert(scaled === at(bits))
  }

  test("ngramJaccard finds near-dups through the inverted index only") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      shingleN = 3, minJaccard = 0.3).collect()
    val p12 = pairs.find(r => r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L).get
    assert(p12.getAs[Double]("jaccard") == 1.0)
    val p13 = pairs.find(r => r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 3L).get
    assert(p13.getAs[Double]("jaccard") > 0.3 && p13.getAs[Double]("jaccard") < 1.0)
    assert(!pairs.exists(r => r.getAs[Long]("doc_a") == 4L || r.getAs[Long]("doc_b") == 4L))
  }

  test("dupClustersStar == dupClusters, and survives a deep chain") {
    // a 60-link chain: min-label would need 60 rounds; star finishes
    // within its default 20 (O(log n)), labeling everything with node 0
    val chain = (0L until 60L).map(i => (i, i + 1)).toDF("a", "b")
    val star = Dedup.dupClustersStar(chain, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star.size == 61 && star.values.toSet == Set(0L))
    // propagation with enough rounds agrees
    val prop = Dedup.dupClusters(chain, "a", "b", maxIters = 70)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == prop)
    // and min-label propagation genuinely fails at its round budget here
    assertThrows[IllegalStateException] {
      Dedup.dupClusters(chain, "a", "b", maxIters = 10)
    }
    // real-data agreement: both algorithms on the minhash pairs
    val docsSf = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val pairsSf = Dedup.minHashPairs(docsSf, "doc_id", "text", 8, 3, 2)
    val a = Dedup.dupClusters(pairsSf, "doc_a", "doc_b")
    val b = Dedup.dupClustersStar(pairsSf, "doc_a", "doc_b")
    assert(a.exceptAll(b).union(b.exceptAll(a)).isEmpty)
  }

  test("df-ascending shingle order cuts candidates on a skewed corpus, same result") {
    // power-law skew: every doc shares one hot boilerplate opening, then
    // diverges — under hash order the boilerplate shingles land in many
    // prefixes and pair everything with everything; under df order they
    // sort LAST and fall outside every prefix
    val boiler = "terms of service apply to all content on this site"
    val skewed = (0 until 24).map { i =>
      (i.toLong, s"$boiler unique${i}a unique${i}b unique${i}c unique${i}d unique${i}e unique${i}f")
    }.toDF("doc_id", "text")
    val (_, candHash) = Dedup.ngramJaccardCandidates(
      skewed, "doc_id", "text", 3, 0.5, None, "hash")
    val (_, candDf) = Dedup.ngramJaccardCandidates(
      skewed, "doc_id", "text", 3, 0.5, None, "df")
    val (nHash, nDf) = (candHash.count(), candDf.count())
    assert(nDf < nHash,
      s"df order must prune the boilerplate collisions: $nDf vs $nHash")
    // ordering is a cost lever only: verified pairs are identical
    val pHash = Dedup.ngramJaccardPairs(skewed, "doc_id", "text", 3, 0.5)
    val pDf = Dedup.ngramJaccardPairs(skewed, "doc_id", "text", 3, 0.5,
      shingleOrder = "df")
    assert(pHash.exceptAll(pDf).union(pDf.exceptAll(pHash)).isEmpty)
    // and on real data the two orders agree too
    val docsSf = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val rHash = Dedup.ngramJaccardPairs(docsSf, "doc_id", "text", 3, 0.5)
    val rDf = Dedup.ngramJaccardPairs(docsSf, "doc_id", "text", 3, 0.5,
      shingleOrder = "df")
    assert(rHash.exceptAll(rDf).union(rDf.exceptAll(rHash)).isEmpty)
  }

  test("length binning cuts candidates on a length-skewed corpus, same result") {
    // every doc shares one hot shingle, but lengths span two orders of
    // magnitude: under plain prefix join the hot shingle pairs short docs
    // with long ones that the length filter then kills POST-shuffle;
    // binning by floor(log_{1/t} n) prunes those collisions pre-shuffle
    val hot = "terms of service apply to all content on this site"
    val skewed = (0 until 30).map { i =>
      val extra = (0 until (if (i % 2 == 0) 3 else 120))
        .map(j => s"w$i-$j").mkString(" ")
      (i.toLong, s"$hot $extra")
    }.toDF("doc_id", "text")
    Dedup.ngramJaccardCandidates(
      skewed, "doc_id", "text", 3, 0.5, None, "hash")._2.count()
    val nPlain = Dedup.lastCollisionStage.get.count()
    Dedup.ngramJaccardCandidates(
      skewed, "doc_id", "text", 3, 0.5, None, "hash", lengthBinned = true)._2.count()
    val nBinned = Dedup.lastCollisionStage.get.count()
    assert(nBinned < nPlain,
      s"binning must prune length-incompatible collisions: $nBinned vs $nPlain")
    // binning is a cost lever only: verified pairs are identical
    val pPlain = Dedup.ngramJaccardPairs(skewed, "doc_id", "text", 3, 0.5)
    val pBinned = Dedup.ngramJaccardPairs(skewed, "doc_id", "text", 3, 0.5,
      lengthBinned = true)
    assert(pPlain.exceptAll(pBinned).union(pBinned.exceptAll(pPlain)).isEmpty)
    // and on real data the variants agree (binning composes with df order)
    val docsSf = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val rPlain = Dedup.ngramJaccardPairs(docsSf, "doc_id", "text", 3, 0.5)
    val rBoth = Dedup.ngramJaccardPairs(docsSf, "doc_id", "text", 3, 0.5,
      shingleOrder = "df", lengthBinned = true)
    assert(rPlain.exceptAll(rBoth).union(rBoth.exceptAll(rPlain)).isEmpty)
  }

  test("CC loops with a reliable statePath produce identical clusters") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cc").toString
    val chain = (0L until 20L).map(i => (i, i + 1)).toDF("a", "b")
    val base = Dedup.dupClusters(chain, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Dedup.stateWriteThreads.clear()
    val durable = Dedup.dupClusters(chain, "a", "b",
      statePath = Some(s"$tmp/prop"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(durable == base)
    // round state is real parquet on reliable storage — a lost executor
    // recomputes from the last round's table instead of failing the job
    assert(spark.read.parquet(s"$tmp/prop/labels_0").count() == 21)
    // the per-round durable writes are DOUBLE-BUFFERED: every frontier
    // write was issued off the loop thread (the loop blocks only on the
    // localCheckpoint it consumes, not on the parquet round trip)
    import scala.jdk.CollectionConverters._
    val writeThreads = Dedup.stateWriteThreads.asScala.toSet
    assert(writeThreads.nonEmpty, "durable run must record its write threads")
    assert(!writeThreads.contains(Thread.currentThread().getName),
      s"state writes ran on the loop thread: $writeThreads")
    val starDurable = Dedup.dupClustersStar(chain, "a", "b",
      statePath = Some(s"$tmp/star"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(starDurable == base)
    assert(spark.read.parquet(s"$tmp/star/edges_init").count() == 20)
  }

  test("batched convergence probes (checkEvery) reduce actions, same result") {
    // 11 edges → nodes 0..11 → label propagation converges in exactly 12
    // rounds, so checkEvery=3's last probe (round 12) coincides with
    // every-round's: identical round count, 8 fewer probe actions
    val chain = (0L until 11L).map(i => (i, i + 1)).toDF("a", "b")
    val everyRound = Dedup.dupClusters(chain, "a", "b", maxIters = 30)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    // listener events post asynchronously: poll until the count is stable
    def settledCount(): Int = {
      var prev = -1
      var cur = jobs.get()
      val deadline = System.nanoTime() + 5000000000L
      while (cur != prev && System.nanoTime() < deadline) {
        prev = cur; Thread.sleep(300); cur = jobs.get()
      }
      cur
    }
    spark.sparkContext.addSparkListener(listener)
    val batched = Dedup.dupClusters(chain, "a", "b", maxIters = 30, checkEvery = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val jobsBatched = settledCount()
    jobs.set(0)
    Dedup.dupClusters(chain, "a", "b", maxIters = 30).collect()
    val jobsEvery = settledCount()
    spark.sparkContext.removeSparkListener(listener)
    assert(batched == everyRound)
    // fewer driver-blocking probe jobs despite (up to K−1) extra rounds
    assert(jobsBatched < jobsEvery,
      s"expected fewer jobs with checkEvery=3: $jobsBatched vs $jobsEvery")
  }

  test("sigPath persisted-signature variant returns identical pairs") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sig").toString
    val docsSf = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val local = Dedup.ngramJaccardPairs(docsSf, "doc_id", "text", 3, 0.5)
    val persisted = Dedup.ngramJaccardPairs(docsSf, "doc_id", "text", 3, 0.5,
      sigPath = Some(s"$tmp/jaccard_sigs"))
    assert(local.exceptAll(persisted).union(persisted.exceptAll(local)).isEmpty)
    // the persisted table is real parquet on disk (the reusable artifact)
    assert(spark.read.parquet(s"$tmp/jaccard_sigs").count() == docsSf.count())
  }

  test("incrementalDedup flags batch docs near-duplicate of the corpus, keeps novel ones") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (4L, "completely different content about spark engines and shuffles")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),   // dup of 1
      (11L, "entirely novel text with no overlap whatsoever here at all")
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(corpus, batch, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_corpus_dups"), r.getAs[Boolean]("keep")))).toMap
    assert(out(10L) == ((1L, false)), s"batch dup not flagged: $out")
    assert(out(11L) == ((0L, true)), s"novel doc not kept: $out")
    // one row per batch doc, corpus docs never appear
    assert(out.keySet == Set(10L, 11L))
  }

  test("incrementalDedup: corpus is not self-paired and batch is not self-paired") {
    // two identical CORPUS docs and two identical BATCH docs, all four
    // mutually distinct across sides: no cross-side band agreement means
    // zero flags — intra-side duplicates are out of contract
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "one two three four five six seven eight nine ten"),
      (11L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(corpus, batch, "doc_id", "text").collect()
    assert(out.forall(_.getAs[Long]("n_corpus_dups") == 0L),
      "intra-side duplicates must not be flagged as corpus dups")
  }

  test("incrementalDedup persists the corpus band index via corpusBandsPath") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-inc").toString
    val docsSf = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val corpus = docsSf.filter($"doc_id" % 37 =!= 2)
    val batch = docsSf.filter($"doc_id" % 37 === 2)
    val local = Dedup.incrementalDedup(corpus, batch, "doc_id", "text")
    val persisted = Dedup.incrementalDedup(corpus, batch, "doc_id", "text",
      corpusBandsPath = Some(s"$tmp/corpus_sigs"))
    assert(local.exceptAll(persisted).union(persisted.exceptAll(local)).isEmpty)
    assert(spark.read.parquet(s"$tmp/corpus_sigs").count() == corpus.count())
  }

  test("verify-side strategy derives from MEASURED signature bytes; results invariant") {
    // a corpus with real pairs so the verify legs execute
    val corpus = (1L to 60L).map { i =>
      val base = (0 until 12).map(j => s"w${i}a$j").mkString(" ")
      (i, if (i % 10 == 0) (0 until 12).map(j => s"w${i - 1}a$j").mkString(" ") else base)
    }.toDF("doc_id", "text")
    def run(): (Seq[String], Int, Int) = {
      val df = Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
        shingleN = 3, minJaccard = 0.5)
      val rows = df.collect().map(_.toString).sorted.toSeq
      val plan = df.queryExecution.executedPlan.toString
      (rows,
        "BroadcastHashJoin".r.findAllMatchIn(plan).length,
        "ShuffledHashJoin".r.findAllMatchIn(plan).length)
    }
    val thrKey = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(thrKey)
    try {
      // measured bytes (a few KB) under the default threshold: the two
      // verify joins broadcast (zero-shuffle verify for a small corpus)
      val (small, bhjSmall, _) = run()
      assert(bhjSmall >= 2, s"small signature table should broadcast-verify ($bhjSmall bhj)")
      // threshold below the measured bytes: the hint flips the verify
      // joins to the SHUFFLED-HASH tier (per-partition build bounded by
      // the measured bytes — the candidate stream is shuffled but never
      // SORTED) and nothing changes in the result (strategy is physical
      // only). This is the guard against the planner's static
      // under-estimate of array bytes: the decision came from the
      // MEASURED checkpoint, not the plan.
      spark.conf.set(thrKey, "1")
      val (hashed, bhjHashed, shjHashed) = run()
      assert(bhjHashed == 0 && shjHashed >= 2,
        s"sub-threshold run must shuffle-hash the verify ($bhjHashed bhj / $shjHashed shj)")
      assert(hashed == small, "join strategy changed the verified pairs")
      // disabled broadcasts (-1): same hashed path
      spark.conf.set(thrKey, "-1")
      val (disabled, bhjDis, _) = run()
      assert(bhjDis == 0 && disabled == small)
    } finally spark.conf.set(thrKey, saved)
  }

  test("containmentPairs finds a quoted subset that Jaccard dedup misses") {
    // doc 2 is a verbatim quote of a small piece of doc 1: containment of
    // 2-in-1 is 1.0, Jaccard is tiny (|S_2| / |S_1|)
    val long = ((1 to 40).map(i => s"w$i") ++ Seq("alpha", "beta", "gamma", "delta", "epsilon"))
      .mkString(" ")
    val quote = "alpha beta gamma delta epsilon"
    val noise = (100 to 130).map(i => s"x$i").mkString(" ")
    val docs = Seq((1L, long), (2L, quote), (3L, noise)).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, "doc_id", "text",
      shingleN = 3, minContainment = 0.9, dfCap = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(r.fieldIndex("c_ab")), r.getDouble(r.fieldIndex("c_ba"))))
    assert(pairs.length == 1)
    val (a, b, cab, cba) = pairs.head
    assert((a, b) == (1L, 2L))
    // quote has 3 shingles, all inside doc 1: containment of the SMALL
    // side is 1.0 (c_ba, since doc 2 is "b"), the long side's is small
    assert(cba == 1.0 && cab < 0.2)
    // and the Jaccard operator at a normal threshold does NOT pair them
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      shingleN = 3, minJaccard = 0.5)
    assert(jac.isEmpty)
  }

  test("decontaminateBroadcast ≡ decontaminate, with a shuffle-free screen") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val train = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 37 =!= 1)
    val bench = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 37 === 1)
    val joinForm = Dedup.decontaminate(train, bench, "doc_id", "text", shingleN = 3)
    val bcast = Dedup.decontaminateBroadcast(train, bench, "doc_id", "text", shingleN = 3)
    assert(bcast.exceptAll(joinForm).union(joinForm.exceptAll(bcast)).isEmpty)
    // the screen is one map-side pass: scan → project → filter, no
    // exchange anywhere in the plan (the benchmark collected at
    // composition, like BloomJoin's plan-literal build)
    val plan = bcast.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(3000))
  }

  test("spanCuts merges overlapping duplicated spans into intervals; within-doc repeats don't cut") {
    val docs = Seq(
      (1L, "a b c d e f"),            // dup spans at 0,1 (with d2) and 3 (with d5)
      (2L, "x a b c d y"),            // dup spans at 1,2
      (4L, "m n o m n o m n o"),      // repeats only WITHIN itself → clean
      (5L, "a b c z z z d e f")       // dup at 0 and 6 → two DISJOINT intervals
    ).toDF("doc_id", "text")
    val out = Dedup.spanCuts(docs, "doc_id", "text", shingleN = 3)
      .orderBy("doc_id", "cut_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 0L, 6L, 3L),   // [0,4) from spans 0,1 chains into [3,6) from span 3
      (2L, 1L, 5L, 2L),
      (5L, 0L, 3L, 1L), (5L, 6L, 9L, 1L)))
  }

  test("property: spanCuts ≡ brute-force interval computation on random corpora") {
    val rnd = new scala.util.Random(29) // deterministic
    val n = 3
    (1 to 5).foreach { round =>
      // tiny alphabet + short docs → dense cross-doc span collisions
      val docs = (1L to 12L).map { id =>
        val len = 3 + rnd.nextInt(8)
        (id, (0 until len).map(_ => ('a' + rnd.nextInt(4)).toChar.toString).mkString(" "))
      }
      // brute force: positional spans, cross-doc dup set, interval merge
      val spansOf: Map[Long, IndexedSeq[(Int, String)]] = docs.map { case (id, t) =>
        val toks = t.split(" ")
        id -> (0 to toks.length - n).map(i => (i, toks.slice(i, i + n).mkString(" ")))
      }.toMap
      val docFreq = spansOf.toSeq.flatMap { case (id, sp) => sp.map(_._2).distinct.map((id, _)) }
        .groupBy(_._2).view.mapValues(_.size).toMap
      val expect = spansOf.toSeq.flatMap { case (id, sp) =>
        val hits = sp.collect { case (i, s) if docFreq(s) >= 2 => (i.toLong, (i + n).toLong) }
        // merge [s, e) intervals, counting members
        val merged = hits.sortBy(_._1).foldLeft(Vector.empty[(Long, Long, Long)]) {
          case (acc, (s, e)) if acc.nonEmpty && s <= acc.last._2 =>
            val (ps, pe, c) = acc.last
            acc.init :+ ((ps, math.max(pe, e), c + 1))
          case (acc, (s, e)) => acc :+ ((s, e, 1L))
        }
        merged.map { case (s, e, c) => (id, s, e, c) }
      }.toSet
      val got = Dedup.spanCuts(docs.toDF("doc_id", "text"), "doc_id", "text", n)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == expect, s"round $round:\n got=$got\n exp=$expect")
    }
  }

  test("dupSpans: cross-doc shared spans counted per doc, clean docs report zero") {
    // docs 1/2 share the span "the quick fox"; doc 3 is clean; doc 4
    // repeats a span internally (within-doc repeat is NOT duplication)
    val docs = Seq(
      (1L, "the quick fox jumps high"),
      (2L, "see the quick fox run"),
      (3L, "completely different text here"),
      (4L, "echo echo echo echo echo")
    ).toDF("doc_id", "text")
    val out = Dedup.dupSpans(docs, "doc_id", "text", shingleN = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 1: spans {the quick fox, quick fox jumps, fox jumps high} → 1 dup
    // doc 2: spans {see the quick, the quick fox, quick fox run} → 1 dup
    // doc 4: distinct spans collapse to ONE {echo echo echo} seen only here
    assert(out.toSeq == Seq((1L, 3L, 1L), (2L, 3L, 1L), (3L, 2L, 0L), (4L, 1L, 0L)))
  }
}
