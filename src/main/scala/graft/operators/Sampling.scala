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

  /** Keep ~pct% of rows per stratum, deterministically. */
  def stratifiedSample(df: DataFrame, idCol: String, seed: String,
                       pct: Int): DataFrame =
    df.filter(hashBucket(col(idCol), seed, 100) < pct)
}
