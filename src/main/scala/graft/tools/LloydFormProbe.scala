package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Similarity
import graft.sources.Tables

/** A/B attribution for q_semdedup's sf1 step (r17 verdict: 4.65 → 8.59 s
  * at sf1 while FLAT at sf0.1 — the one family outlier in an otherwise
  * ambient-shaped drift, with r17's table-resident Lloyd rewrite as the
  * prime suspect): time the TABLE-RESIDENT k-means assignment
  * ([[Similarity.kmeansAssign]] — per-round one-row folded-centroid
  * broadcast, per-row `array_max` over a transform of the broadcast
  * array) against the pre-r17 LITERAL form
  * ([[Similarity.kmeansAssignLiteral]] — per-round k·dim driver collect,
  * per-row codegen'd `greatest` over k struct literals) at q_semdedup's
  * exact shape (k = 8, iters = 1), plus the full semDedup (assignment +
  * within-cluster pair join) to bound how much of the step the
  * assignment leg can even explain. Spec-pinned row-for-row equality
  * between the forms means any gap here is pure execution cost.
  *
  * Run each form in a FRESH JVM (separate runMain invocations) — the
  * r17 scale harness showed JIT/ambient state flattening exactly this
  * kind of gap.
  *
  * Usage: runMain graft.tools.LloydFormProbe [sfDir] [form] [k] [iters]
  *   form: resident | literal | semdedup
  */
object LloydFormProbe {

  private def lowerMedian(run: () => Unit, reps: Int = 3): Double = {
    run() // warm (scan caches, codegen)
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      run()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    times((times.size - 1) / 2)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val form = args.lift(1).getOrElse("resident")
    val k = args.lift(2).map(_.toInt).getOrElse(8)
    val iters = args.lift(3).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-lloydform")
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(spark)
    // q_semdedup's exact input shape: corpus spread to all cores (the
    // SparkEntry `spread`), NOT pre-checkpointed — the bench pays the
    // read + repartition inside the timed region too
    val emb = Tables.embeddings(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism)
    val n = emb.count()
    // Bench's consumption: toRdd.count() forces every row of the full
    // plan — an agg consume would let Catalyst ELIMINATE the keep-flag
    // outer join (distinct right side, no referenced columns) and with
    // it the entire within-cluster pair screen being measured
    def consume(df: org.apache.spark.sql.DataFrame): Unit = {
      df.queryExecution.toRdd.count(); ()
    }
    val sec = form match {
      case "resident" => lowerMedian(() =>
        consume(Similarity.kmeansAssign(emb, "vec_id", "embedding", k, iters)))
      case "literal" => lowerMedian(() =>
        consume(Similarity.kmeansAssignLiteral(emb, "vec_id", "embedding", k, iters)))
      case "semdedup" => lowerMedian(() =>
        consume(Similarity.semDedup(emb, "vec_id", "embedding", k, iters,
          minCosine = 0.35).orderBy(col("vec_id"))))
      case "semdedup_literal" => lowerMedian { () =>
        // semDedup's exact body over the LITERAL assignment — the full
        // pre-r17 q_semdedup, so the A/B covers the whole query
        val m = Similarity.kmeansAssignLiteral(emb, "vec_id", "embedding", k, iters)
          .select(col("vec_id"), col("cluster_id"), col("v"))
        val dup = m.as("a").join(m.as("b"),
            col("a.cluster_id") === col("b.cluster_id") &&
              col("a.vec_id") < col("b.vec_id"))
          .filter(round(Similarity.cosineNative(col("a.v"), col("b.v")), 6) >= 0.35)
          .select(col("b.vec_id").as("vec_id")).distinct()
        consume(m.select(col("vec_id"), col("cluster_id"))
          .join(dup.withColumn("__dup", lit(true)), Seq("vec_id"), "left_outer")
          .select(col("vec_id"), col("cluster_id"),
            coalesce(!col("__dup"), lit(true)).as("keep"))
          .orderBy(col("vec_id")))
      }
      case "semdedup_ckpt" => lowerMedian { () =>
        // candidate fix: materialize the assignment ONCE — m feeds the
        // self-join twice AND the keep join-back, so the lazy plan
        // re-executes the whole Lloyd-train + assign lineage 3x
        val m = Similarity.kmeansAssignWithVec(emb, "vec_id", "embedding", k, iters)
          .select(col("vec_id"), col("cluster_id"), col("v"))
          .localCheckpoint()
        val dup = m.as("a").join(m.as("b"),
            col("a.cluster_id") === col("b.cluster_id") &&
              col("a.vec_id") < col("b.vec_id"))
          .filter(round(Similarity.cosineNative(col("a.v"), col("b.v")), 6) >= 0.35)
          .select(col("b.vec_id").as("vec_id")).distinct()
        consume(m.select(col("vec_id"), col("cluster_id"))
          .join(dup.withColumn("__dup", lit(true)), Seq("vec_id"), "left_outer")
          .select(col("vec_id"), col("cluster_id"),
            coalesce(!col("__dup"), lit(true)).as("keep"))
          .orderBy(col("vec_id")))
      }
      case "diag" =>
        // data-vs-execution discriminator: if the two forms assign the
        // same clusters, their pair volumes match and the gap is pure
        // execution; a histogram divergence means the DATA differs
        def hist(m: org.apache.spark.sql.DataFrame): Map[Long, Long] =
          m.groupBy(col("cluster_id")).count()
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val mr = Similarity.kmeansAssignWithVec(emb, "vec_id", "embedding", k, iters)
          .select(col("vec_id"), col("cluster_id"), col("v")).localCheckpoint()
        val ml = Similarity.kmeansAssignLiteral(emb, "vec_id", "embedding", k, iters)
          .select(col("vec_id"), col("cluster_id"), col("v")).localCheckpoint()
        println(s"[lloydform-diag] resident hist: ${hist(mr).toSeq.sorted}")
        println(s"[lloydform-diag] literal  hist: ${hist(ml).toSeq.sorted}")
        def dupCount(m: org.apache.spark.sql.DataFrame): Long =
          m.as("a").join(m.as("b"),
              col("a.cluster_id") === col("b.cluster_id") &&
                col("a.vec_id") < col("b.vec_id"))
            .filter(round(Similarity.cosineNative(col("a.v"), col("b.v")), 6) >= 0.35)
            .select(col("b.vec_id")).distinct().count()
        println(s"[lloydform-diag] resident dups: ${dupCount(mr)}  " +
          s"literal dups: ${dupCount(ml)}")
        0.0
      case "scaled" => lowerMedian(() =>
        // the SHIPPED semDedupScaled (q_semdedup_scaled's exact body) —
        // pair-screen build side left to the planner
        consume(Similarity.semDedupScaled(emb, "vec_id", "embedding",
          minCosine = 0.35, targetClusterRows = 256)
          .orderBy(col("vec_id"))))
      case "scaled_measured" => lowerMedian { () =>
        // candidate fix: semDedupScaled's body with the pair screen's
        // build side picked from MEASURED bytes (semDedup's r18
        // discipline) — if the planner-chosen form hides the same
        // static-estimate cliff, this form dodges it
        val (_, asg) = Similarity.ivfTrainScaled(emb, "vec_id", "embedding",
          n => (n + 255L) / 256L)
        val m = asg.select(col("vec_id"), col("cid").cast("long").as("cluster_id"),
            transform(col("v"), x => x.cast("float")).as("v"))
          .localCheckpoint()
        val st = m.agg(count(lit(1)).as("n"), max(size(col("v"))).as("d")).head
        val bytes =
          if (st.isNullAt(1)) 0L
          else st.getLong(0) * (st.getInt(1).toLong * 4L + 32L)
        val thr = spark.sessionState.conf.autoBroadcastJoinThreshold
        val bSide = if (thr > 0 && bytes <= thr) broadcast(m) else m
        val dup = m.as("a").join(bSide.as("b"),
            col("a.cluster_id") === col("b.cluster_id") &&
              col("a.vec_id") < col("b.vec_id"))
          .filter(round(Similarity.cosineNative(col("a.v"), col("b.v")), 6) >= 0.35)
          .select(col("b.vec_id").as("vec_id")).distinct()
        consume(m.select(col("vec_id"), col("cluster_id"))
          .join(dup.withColumn("__dup", lit(true)), Seq("vec_id"), "left_outer")
          .select(col("vec_id"), col("cluster_id"),
            coalesce(!col("__dup"), lit(true)).as("keep"))
          .orderBy(col("vec_id")))
      }
      case other => throw new IllegalArgumentException(
        s"form must be resident|literal|semdedup|semdedup_literal|scaled|scaled_measured, got '$other'")
    }
    println(f"""[lloydform] {"form":"$form","sf_dir":"$sfDir","rows":$n,""" +
      f""""k":$k,"iters":$iters,"sec":$sec%.3f}""")
    spark.stop()
  }
}
