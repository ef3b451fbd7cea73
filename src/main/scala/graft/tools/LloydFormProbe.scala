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
    val emb = Tables.embeddings(spark, sfDir).localCheckpoint()
    val n = emb.count()
    def consume(df: org.apache.spark.sql.DataFrame): Unit = {
      df.agg(count(lit(1)), sum(col("cluster_id"))).head; ()
    }
    val sec = form match {
      case "resident" => lowerMedian(() =>
        consume(Similarity.kmeansAssign(emb, "vec_id", "embedding", k, iters)))
      case "literal" => lowerMedian(() =>
        consume(Similarity.kmeansAssignLiteral(emb, "vec_id", "embedding", k, iters)))
      case "semdedup" => lowerMedian(() =>
        consume(Similarity.semDedup(emb, "vec_id", "embedding", k, iters,
          minCosine = 0.35)))
      case other => throw new IllegalArgumentException(
        s"form must be resident|literal|semdedup, got '$other'")
    }
    println(f"""[lloydform] {"form":"$form","sf_dir":"$sfDir","rows":$n,""" +
      f""""k":$k,"iters":$iters,"sec":$sec%.3f}""")
    spark.stop()
  }
}
