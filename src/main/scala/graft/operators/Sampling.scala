package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.hash60

/** Deterministic sampling and dataset splitting.
  *
  * Train/val/test assignment must be a pure function of the record id —
  * never `rand()` — so reruns, backfills, and incremental appends agree
  * on every row's split. Assignment is md5-derived (SURVEY §4), fully
  * map-side, and stable under repartitioning.
  */
object Sampling {

  /** Stable bucket in [0, buckets) for an id under a seed. */
  def hashBucket(id: Column, seed: String, buckets: Int): Column =
    pmod(hash60(concat(lit(seed), lit("|"), id.cast("string"))), lit(buckets.toLong))

  /** Label each row train/val/test by hash bucket percentage. */
  def split(df: DataFrame, idCol: String, seed: String,
            trainPct: Int, valPct: Int): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"split percentages must be >= 0 and sum <= 100, got ($trainPct, $valPct)")
    val b = hashBucket(col(idCol), seed, 100)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** LEAKAGE-FREE split: near-duplicate documents must land on the SAME
    * side of a train/val/test split, or the eval set grades memorization
    * of paraphrases the model saw in training. The split key is
    * therefore the near-dup cluster id where one exists — `clusters` is
    * a `(idCol, cluster_id)` table, e.g. from [[Dedup.dupClusters]] —
    * and the document's own id otherwise, then the same deterministic
    * hash-bucket rule as [[split]].
    *
    * Scale shape: one join against the cluster table (pair-derived, so
    * orders of magnitude smaller than the corpus — AQE broadcasts it
    * when it fits) plus the map-side bucket arithmetic. Same nested
    * determinism contract as [[split]]: fate is a pure function of
    * (seed, cluster key).
    */
  def leakFreeSplit(df: DataFrame, clusters: DataFrame, idCol: String,
                    seed: String, trainPct: Int, valPct: Int): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"split percentages must be >= 0 and sum <= 100, got ($trainPct, $valPct)")
    val b = hashBucket(coalesce(col("cluster_id"), col(idCol)), seed, 100)
    df.join(clusters.select(col(idCol), col("cluster_id")), Seq(idCol), "left")
      .withColumn("split",
        when(b < trainPct, "train")
          .when(b < trainPct + valPct, "val")
          .otherwise("test"))
      .drop("cluster_id")
  }

  /** Keep ~pct% of rows per stratum, deterministically. */
  def stratifiedSample(df: DataFrame, idCol: String, seed: String,
                       pct: Int): DataFrame =
    df.filter(hashBucket(col(idCol), seed, 100) < pct)

  /** DATA MIXING: down-sample each source to a per-source rate (in
    * basis points of 10000) — the "mixture weights" step of training-
    * data assembly, where each corpus contributes a tuned fraction.
    *
    * Same determinism contract as [[split]]: keep/drop is a pure
    * function of (seed, id), so reruns and incremental appends agree
    * row-by-row, and the same doc keeps consistent fate across rate
    * changes (monotone: raising a source's rate only ADDS docs —
    * hash-threshold sampling is nested). A source absent from `rates`
    * keeps rate 10000 (everything). Fully map-side: one filter over
    * the scan, no shuffle.
    */
  def mixture(df: DataFrame, idCol: String, sourceCol: String,
              seed: String, rates: Map[String, Int]): DataFrame = {
    require(rates.values.forall(r => r >= 0 && r <= 10000),
      s"rates are basis points in [0, 10000], got $rates")
    val b = hashBucket(col(idCol), seed, 10000)
    val rate = rates.foldLeft(lit(10000)) { case (acc, (src, r)) =>
      when(col(sourceCol) === src, lit(r)).otherwise(acc)
    }
    df.filter(b < rate)
  }

  /** TEMPERATURE mixing: derive each source's sampling rate from its own
    * size — rate_s = (n_min / n_s)^(1−α) — instead of hand-set weights.
    * α = 1 keeps the natural distribution; α → 0 flattens it toward
    * uniform (the standard multilingual/data-balancing schedule). The
    * smallest source always keeps 100% (sampling can only remove), and
    * rates quantize to basis points so keep/drop stays a pure integer
    * comparison per row.
    *
    * Shape at 100 TB: one count aggregate over the corpus (map-side
    * combine), a broadcast of per-source rates, and a map-side filter —
    * the corpus itself never shuffles.
    *
    * α = 0.5 computes via `sqrt` (IEEE correctly-rounded, so the rate
    * table is bit-reproducible across engines — the oracle path); other
    * α use `pow` (1-ulp library variance possible at bin boundaries,
    * fine for production, not for a hash-equality oracle).
    */
  def temperatureMixture(df: DataFrame, idCol: String, sourceCol: String,
                         seed: String, alpha: Double): DataFrame =
    temperatureMixtureStratified(df, idCol, Seq(sourceCol), seed, alpha)

  /** [[temperatureMixture]] over a COMPOSITE stratum — e.g. (source,
    * lang), the multilingual-corpus shape where each source×language
    * cell gets its own `(n_min / n_cell)^(1−α)` rate so a large source
    * cannot drown a small language inside it. Same plan shape: one
    * count aggregate (now keyed by the stratum tuple), a broadcast rate
    * table, a map-side filter; the corpus never shuffles.
    */
  def temperatureMixtureStratified(df: DataFrame, idCol: String,
                                   strataCols: Seq[String], seed: String,
                                   alpha: Double): DataFrame =
    temperatureMixtureBy(df, idCol, strataCols, seed, alpha, count(lit(1)))

  /** [[temperatureMixtureStratified]] with TOKEN-mass cell sizes: rates
    * derive from `sum(weightCol)` per stratum instead of document
    * counts — what a training mix actually budgets (a source of few
    * huge documents must down-sample like a source of many small
    * ones). Selection stays per-document hash thresholding, so the
    * kept token mass per cell is the rate in EXPECTATION (unbiased —
    * a document's fate is independent of its size); exact token-budget
    * packing would need ordered selection and is a packing problem,
    * not a sampling one ([[graft.operators.Packing.pack]]).
    */
  def temperatureMixtureWeighted(df: DataFrame, idCol: String,
                                 strataCols: Seq[String], weightCol: String,
                                 seed: String, alpha: Double): DataFrame =
    temperatureMixtureBy(df, idCol, strataCols, seed, alpha,
      sum(col(weightCol)))

  /** DSIR importance weights — Data Selection via Importance Resampling
    * (Xie et al., NeurIPS 2023): score every raw document by how
    * target-like its token distribution is, using hashed bag-of-tokens
    * models of the target and raw corpora. The weight is the
    * log-likelihood ratio of the document under two smoothed
    * multinomials over `buckets` hashed token slots:
    * `Σ_tokens [ ln p_target(bucket) − ln p_raw(bucket) ]` with
    * add-`alpha` smoothing — positive = looks like the target.
    * Hashing makes the feature space fixed-width regardless of
    * vocabulary, the move that lets the method run at corpus scale.
    *
    * Scale shape: two bucket-count aggregates (each one exchange over
    * ≤ `buckets` rows — thousands, not corpus-sized), a full-outer
    * join + one-row totals both broadcast, then the per-token
    * ratio lookup is a BROADCAST join (the ratio table is `buckets`
    * rows) and the per-doc sum is ONE exchange on the id. Nothing
    * driver-side; the model "training" is the two tiny aggregates —
    * the paper's fit-two-bag-of-ngrams-models step.
    *
    * Same md5 bucket idiom as [[split]] (DuckDB-parity, seed-stable).
    * Documents with no tokens weight 0. Tokens are whitespace splits
    * of `textCol`; hashed bigrams can ride the same plumbing by
    * pre-concatenating a shifted column, deliberately left to the
    * caller (the synthetic corpus is unigram-shaped).
    */
  /** Token-BUDGET allocation with per-source repetition caps — the
    * water-filling problem a data-constrained training run solves
    * (Muennighoff et al. 2023, arXiv:2305.16264: repeating data beyond
    * ~4 epochs stops helping, so a budget can't just scale every source
    * proportionally): give source i allocation
    * `a_i = min(cap_i, λ·w_i)` with `cap_i = maxEpochs · mass_i`, where
    * λ is chosen so Σ a_i = budget. Classic water-filling: sort sources
    * by `cap_i / w_i` ascending — as λ rises, sources saturate in that
    * order; prefix sums find the saturation boundary in one window
    * pass, no iteration. If the budget exceeds Σ cap (every source
    * saturates), allocations are the caps and the budget is simply
    * UNDER-filled — repeating past the cap is the thing the cap
    * forbids, so this is the correct answer, not an error.
    *
    * `perSource` has one row per source: (sourceCol, massCol = token
    * mass, weightCol = target share weight). Sources number in the
    * tens — the corpus-scale work is the upstream mass aggregation;
    * the single unpartitioned sort window here orders that handful,
    * and the one collected λ is a size-guarded scalar (like a
    * broadcast band bound). Returns (source, mass, cap, allocation,
    * epochs = allocation / mass), deterministic given deterministic
    * inputs.
    */
  def budgetMix(perSource: DataFrame, sourceCol: String, massCol: String,
                weightCol: String, budget: Double,
                maxEpochs: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget > 0, s"budget must be positive, got $budget")
    require(maxEpochs > 0, s"maxEpochs must be positive, got $maxEpochs")
    val base = perSource.select(col(sourceCol).as("source"),
        col(massCol).cast("double").as("mass"),
        col(weightCol).cast("double").as("weight"))
      .withColumn("cap", col("mass") * maxEpochs)
      .withColumn("r", col("cap") / col("weight"))
    val w = Window.orderBy(col("r"), col("source"))
    val sums = base
      .crossJoin(broadcast(base.agg(sum(col("weight")).as("W"))))
      .withColumn("prefC", sum(col("cap")).over(w))
      .withColumn("prefW", sum(col("weight")).over(w))
      // source i saturates iff setting λ = r_i still fits the budget
      // with every earlier (lower-ratio) source already at its cap
      .withColumn("sat",
        col("r") * (col("W") - (col("prefW") - col("weight"))) +
          (col("prefC") - col("cap")) <= lit(budget))
    // λ from the saturation boundary: one tiny agg (rows = sources)
    val bRow = sums.agg(
      sum(when(col("sat"), col("cap"))).as("satC"),
      sum(when(col("sat"), col("weight"))).as("satW"),
      sum(col("weight")).as("W"),
      count(when(!col("sat"), lit(1))).as("nUnsat")).head()
    val lambda: Option[Double] =
      if (bRow.getLong(3) == 0L) None // every source capped: under-fill
      else Some((budget - Option(bRow.get(0)).fold(0.0)(_ => bRow.getDouble(0))) /
        (bRow.getDouble(2) - Option(bRow.get(1)).fold(0.0)(_ => bRow.getDouble(1))))
    sums.select(col("source"), col("mass"), col("cap"),
        when(col("sat") || lit(lambda.isEmpty), col("cap"))
          .otherwise(lit(lambda.getOrElse(0.0)) * col("weight")).as("allocation"))
      .withColumn("epochs", col("allocation") / col("mass"))
  }

  def dsirWeights(raw: DataFrame, target: DataFrame, idCol: String,
                  textCol: String, seed: String = "dsir",
                  buckets: Int = 1024, alpha: Double = 1.0): DataFrame = {
    require(buckets > 0 && alpha > 0, s"need buckets > 0, alpha > 0")
    def toks(df: DataFrame) = df
      .select(col(idCol), explode(
        org.apache.spark.sql.functions.split(col(textCol), "\\s+")).as("__tok"))
      .filter(length(col("__tok")) > 0)
      .select(col(idCol),
        pmod(hash60(concat(lit(seed + "|"), col("__tok"))),
          lit(buckets.toLong)).as("__b"))
    val rawToks = toks(raw)
    val counts = rawToks.groupBy("__b").agg(count(lit(1)).as("__qc"))
      .join(toks(target).groupBy("__b").agg(count(lit(1)).as("__tc")),
        Seq("__b"), "full_outer")
      .na.fill(0L, Seq("__tc", "__qc"))
    // totals via an UNPARTITIONED window over the ≤`buckets`-row count
    // table — one single-partition pass over ~1k rows; the obvious
    // crossJoin(agg(sum)) alternative re-evaluates the whole bucket
    // join (and its two token scans) a second time, because two
    // different aggregates over one subtree don't share an exchange
    val whole = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val ratio = counts
      .select(col("__b"),
        (log((col("__tc") + alpha) / (sum("__tc").over(whole) + alpha * buckets)) -
         log((col("__qc") + alpha) / (sum("__qc").over(whole) + alpha * buckets))).as("__lr"))
    val weights = rawToks.join(broadcast(ratio), Seq("__b"))
      .groupBy(col(idCol)).agg(sum(col("__lr")).as("dsir_weight"))
    raw.join(weights, Seq(idCol), "left")
      .withColumn("dsir_weight", coalesce(col("dsir_weight"), lit(0.0)))
  }

  /** Keep the top `keepFraction` of raw documents by DSIR weight: the
    * selection step, deterministic (no gumbel resampling — the paper's
    * noise exists to diversify repeated draws; a reproducible pipeline
    * wants the argmax set). The threshold is ONE exact-percentile
    * aggregate over the weights (distributed partial agg), then a
    * map-side filter — no global sort, no single-partition window.
    * Boundary ties all keep (>= threshold), so the kept set is a
    * deterministic superset of the fraction.
    */
  def dsirSelect(weighted: DataFrame, keepFraction: Double): DataFrame = {
    require(keepFraction > 0 && keepFraction <= 1,
      s"keepFraction in (0, 1], got $keepFraction")
    val thr = weighted.agg(
      expr(s"percentile(dsir_weight, ${1.0 - keepFraction})").as("__thr"))
    weighted.crossJoin(broadcast(thr))
      .filter(col("dsir_weight") >= col("__thr")).drop("__thr")
  }

  private def temperatureMixtureBy(df: DataFrame, idCol: String,
                                   strataCols: Seq[String], seed: String,
                                   alpha: Double,
                                   cellSize: Column): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    require(strataCols.nonEmpty, "at least one stratum column")
    val counts = df.groupBy(strataCols.map(col): _*).agg(cellSize.as("__n"))
    val ratio = col("__nmin").cast("double") / col("__n").cast("double")
    val scaled =
      if (alpha == 1.0) lit(1.0)
      else if (alpha == 0.5) sqrt(ratio)
      else pow(ratio, 1.0 - alpha)
    val rates = counts
      .crossJoin(broadcast(counts.agg(min(col("__n")).as("__nmin"))))
      .select(strataCols.map(col) :+
        floor(lit(10000) * scaled).cast("int").as("__rate"): _*)
    df.join(broadcast(rates), strataCols)
      .filter(hashBucket(col(idCol), seed, 10000) < col("__rate"))
      .drop("__rate")
  }
}
