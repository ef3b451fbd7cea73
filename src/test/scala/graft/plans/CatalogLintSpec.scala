package graft.plans

import graft.SparkSpec
import graft.tools.PlanLint

/** Every query in the catalog, linted: no partition-less windows, no
  * cartesian joins, no UDFs, no defeated pushdown — EXCEPT the entries
  * documented below, each of which is bounded by construction. This is
  * the 100 TB review running against all of SparkEntry at once: a new
  * query with a silent scale killer fails this spec, not a code review.
  */
class CatalogLintSpec extends SparkSpec {

  // error-severity findings allowed, with the boundedness argument:
  //  - q_histogram_quantile: the global window runs over the MERGED
  //    HISTOGRAM — cardinality = distinct rounded values (domain-bounded)
  //  - q_hybrid_rrf / q_hybrid_search: global rank windows run over
  //    top-k result tables (k rows by construction)
  //  - q_dsir: the global-total window runs over the hashed-ngram BUCKET
  //    table (≤ `buckets` rows, default 1024 — Sampling.scala dsirWeights),
  //    chosen over crossJoin(agg) precisely to avoid re-evaluating the
  //    bucket join twice
  //  - q_mix_budget: the water-filling prefix-sum window runs over the
  //    PER-SOURCE table (one row per source — tens; Sampling.budgetMix);
  //    the corpus-scale work is the upstream mass aggregation
  private val boundedGlobalWindows = Set(
    "q_histogram_quantile", "q_hybrid_rrf", "q_hybrid_search", "q_dsir",
    "q_mix_budget")

  //  - ANN/hybrid queries attach the QUERY VECTOR by
  //    crossJoin(broadcast(filter(vec_id === literal))): one row by the
  //    id-uniqueness data contract, which the PLAN cannot prove (PlanLint
  //    already recognizes provably-one-row aggregates; a filtered scan
  //    is not provable)
  private val broadcastPointLookups = Set(
    "q_ann_bruteforce", "q_ann_ivf_trained", "q_ann_ivf_indexed",
    "q_ann_ivf_scaled", "q_ann_ivf_scaled_indexed",
    "q_hybrid_search", "q_hybrid_rrf", "q_ann_sq", "q_ann_sq_indexed")

  test("all catalog queries lint clean of scale errors (documented exceptions only)") {
    val sf = "/root/testdata/sf0.001"
    val offenders = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val errors =
        try PlanLint.lint(fn(spark, sf)).filter(_.severity == "error")
        catch { case e: Throwable => fail(s"$name failed to plan: $e") }
      errors.foreach { f =>
        val excepted =
          (f.kind == "single-partition-window" && boundedGlobalWindows(name)) ||
          (f.kind == "cartesian" && broadcastPointLookups(name))
        if (!excepted) offenders += ((name, s"${f.kind}: ${f.detail.take(100)}"))
      }
    }
    assert(offenders.isEmpty,
      offenders.map { case (n, d) => s"$n -> $d" }.mkString("\n"))
  }
}
